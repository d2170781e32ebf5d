"""Checkpoint save/load + external weight import.

The reference has no checkpoint subsystem at all — model weights arrive as
a Google-Drive zip of ONNX/SavedModel/TensorRT blobs (README :13-26) that
Triton loads by directory convention. Here weights are first-class orbax
checkpoints of flax variable pytrees, restored once at server start, plus
converters from the public upstream formats:

  * `import_torch_hrnet` — official pose_hrnet (leaderboard HRNet release)
    state_dict -> our flax tree. Pure tensor renaming + OIHW->HWIO
    transposes; validated by an exact export/import round trip in tests
    (no torch runtime needed, state_dict values as numpy).
  * `models/tflite_import.py` — the SSD path (real weights, see there).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from human_body_proportion_estimation_tpu.models.hrnet import (
    HRNET_W32,
    HRNetConfig,
)

# --------------------------------------------------------------------- #
# orbax checkpoints


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pipeline_checkpoint(directory: str, det_vars: Any, pose_vars: Any):
    """Persist detector + pose variable collections under `directory`."""
    ckpt = _checkpointer()
    ckpt.save(
        os.path.join(os.path.abspath(directory), "det"), det_vars, force=True
    )
    ckpt.save(
        os.path.join(os.path.abspath(directory), "pose"), pose_vars,
        force=True,
    )


def load_pipeline_checkpoint(directory: str) -> Tuple[Any, Any]:
    ckpt = _checkpointer()
    det = ckpt.restore(os.path.join(os.path.abspath(directory), "det"))
    pose = ckpt.restore(os.path.join(os.path.abspath(directory), "pose"))
    return det, pose


def save_pose_checkpoint(directory: str, pose_vars: Any):
    """Pose slot only — bottom-up artifacts have no detector collection."""
    _checkpointer().save(
        os.path.join(os.path.abspath(directory), "pose"), pose_vars,
        force=True,
    )


def load_pose_checkpoint(directory: str) -> Any:
    return _checkpointer().restore(
        os.path.join(os.path.abspath(directory), "pose")
    )


# --------------------------------------------------------------------- #
# compact single-file checkpoints (repo-committable certified weights)
#
# The reference makes pretrained weights a hard prerequisite (README
# :13-26 Google-Drive download). This framework commits its synthetic-
# certified flagship weights IN the repo so a fresh clone serves
# meaningful outputs with zero downloads: one compressed .npz per
# checkpoint, tensors stored float16 (the params are consumed as bf16 on
# the MXU anyway; f16's 10 mantissa bits upper-bound the quantization
# error at ~0.05%, far below the certified cm tolerance), keys are
# '/'-joined pytree paths.


def save_compact_checkpoint(path: str, det_vars: Any, pose_vars: Any):
    """Write det+pose variable pytrees into one compressed .npz."""
    flat: Dict[str, np.ndarray] = {}
    for prefix, tree in (("det", det_vars), ("pose", pose_vars)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves:
            name = prefix + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in keypath
            )
            arr = np.asarray(leaf)
            if arr.dtype in (np.float32, np.float64):
                arr = arr.astype(np.float16)
            flat[name] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_compact_checkpoint(path: str) -> Tuple[Any, Any]:
    """Restore (det_vars, pose_vars) from a compact .npz; float tensors
    come back float32 (params are kept f32 at rest, bf16 in compute —
    the framework-wide convention)."""
    data = np.load(path)
    trees: Dict[str, Dict] = {"det": {}, "pose": {}}
    for name in data.files:
        parts = name.split("/")
        node = trees[parts[0]]
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        arr = data[name]
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        node[parts[-1]] = arr
    return trees["det"], trees["pose"]


def default_certified_checkpoint() -> str:
    """Path of the committed synthetic-certified flagship checkpoint
    (EfficientDet-Lite4 @ 480x640 + HRNet-W32 @ 384x288, trained by
    `cli/certify.py --det-arch lite4` on-chip; see BENCHMARKS.md
    'Accuracy (measured)')."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "certified_lite4_w32.npz",
    )


def default_certified_bottomup_checkpoint() -> str:
    """Path of the committed synthetic-certified bottom-up checkpoint
    (HigherHRNet @ 512x512, trained by `cli/certify_bottomup.py` on-chip
    on multi-person renders; pose slot only — the bottom-up pipeline has
    no detector). Loaded by default by `serve.server --bottom-up`."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "certified_higherhrnet.npz",
    )


def maybe_load_certified(bottom_up: bool = False) -> Tuple[Any, Any]:
    """(det_vars, pose_vars) from the committed synthetic-certified
    checkpoint, or (None, None) when the file is absent or
    HBPE_DISABLE_CERTIFIED_FALLBACK is set (tests/conftest.py sets it:
    tiny-config suites must random-init). Edges (server, bench, CLIs)
    call this when the user gave no --checkpoint-dir — the reference
    never runs untrained weights (README.md:13-26 makes the checkpoint
    download mandatory), so neither do the defaults here. Callers should
    mark the slots they use `synthetic-certified` in weights_origin."""
    if os.environ.get("HBPE_DISABLE_CERTIFIED_FALLBACK"):
        return None, None
    path = (default_certified_bottomup_checkpoint() if bottom_up
            else default_certified_checkpoint())
    if not os.path.exists(path):
        return None, None
    return load_compact_checkpoint(path)


# --------------------------------------------------------------------- #
# torch pose_hrnet <-> flax name mapping
#
# Official naming (pose_hrnet): conv1/bn1, conv2/bn2, layer1.{k}.conv{c}/
# bn{c} (+ downsample.0/.1), transition{t}.{i}[.0].{0,1}, stage{s}.{m}.
# branches.{b}.{k}.conv{c}/bn{c}, stage{s}.{m}.fuse_layers.{i}.{j}[...],
# final_layer. Ours: stem1/2, layer1_{k}.conv{c}(+downsample),
# transition{t+1}.adapt_/new_{i}, stage{s}_module{m}.branch{b}_block{k},
# .fuse.up_{j}_{i}/down_{j}_{i}_{step}, head — see models/hrnet.py.


def _hrnet_pairs(cfg: HRNetConfig) -> List[Tuple[Tuple[str, ...], str, str]]:
    """[(flax ConvBN module path, torch conv key, torch bn prefix)].

    Covers every ConvBN in the model; the head is handled separately.
    """
    pairs: List[Tuple[Tuple[str, ...], str, str]] = [
        (("stem1",), "conv1.weight", "bn1"),
        (("stem2",), "conv2.weight", "bn2"),
    ]
    for k in range(4):
        for c in (1, 2, 3):
            pairs.append(
                ((f"layer1_{k}", f"conv{c}"),
                 f"layer1.{k}.conv{c}.weight", f"layer1.{k}.bn{c}")
            )
        if k == 0:  # only the first bottleneck changes channels
            pairs.append(
                ((f"layer1_{k}", "downsample"),
                 f"layer1.{k}.downsample.0.weight",
                 f"layer1.{k}.downsample.1")
            )

    prev: Tuple[int, ...] = (cfg.bottleneck_channels * 4,)
    for stage_idx, (n_modules, channels) in enumerate(
        zip(cfg.stage_modules, cfg.branch_channels)
    ):
        t_ours = f"transition{stage_idx + 2}"
        t_torch = f"transition{stage_idx + 1}"
        for i, ch in enumerate(channels):
            if i < len(prev):
                if prev[i] != ch:
                    pairs.append(
                        ((t_ours, f"adapt_{i}"),
                         f"{t_torch}.{i}.0.weight", f"{t_torch}.{i}.1")
                    )
            else:
                pairs.append(
                    ((t_ours, f"new_{i}"),
                     f"{t_torch}.{i}.0.0.weight", f"{t_torch}.{i}.0.1")
                )
        s_torch = f"stage{stage_idx + 2}"
        for m in range(n_modules):
            mod = f"stage{stage_idx + 2}_module{m}"
            for b in range(len(channels)):
                for k in range(cfg.blocks_per_branch):
                    base = f"{s_torch}.{m}.branches.{b}.{k}"
                    pairs.append(
                        ((mod, f"branch{b}_block{k}", "conv1"),
                         f"{base}.conv1.weight", f"{base}.bn1")
                    )
                    pairs.append(
                        ((mod, f"branch{b}_block{k}", "conv2"),
                         f"{base}.conv2.weight", f"{base}.bn2")
                    )
            n = len(channels)
            for i in range(n):
                for j in range(n):
                    if j > i:
                        pairs.append(
                            ((mod, "fuse", f"up_{j}_{i}"),
                             f"{s_torch}.{m}.fuse_layers.{i}.{j}.0.weight",
                             f"{s_torch}.{m}.fuse_layers.{i}.{j}.1")
                        )
                    elif j < i:
                        for step in range(i - j):
                            pairs.append(
                                ((mod, "fuse", f"down_{j}_{i}_{step}"),
                                 f"{s_torch}.{m}.fuse_layers.{i}.{j}."
                                 f"{step}.0.weight",
                                 f"{s_torch}.{m}.fuse_layers.{i}.{j}."
                                 f"{step}.1")
                            )
        prev = channels
    return pairs


def _get(tree: Dict, path: Tuple[str, ...]) -> Dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def _conv_to_flax(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 1, 0))  # OIHW -> HWIO


def _conv_to_torch(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (3, 2, 0, 1))  # HWIO -> OIHW


def import_torch_hrnet(
    state_dict: Dict[str, np.ndarray],
    flax_vars: Any,
    config: HRNetConfig = HRNET_W32,
    strict: bool = False,
) -> Any:
    """Map a pose_hrnet state_dict (numpy values) onto our variable tree.

    Missing torch keys are skipped unless `strict` (official checkpoints
    lack the unused fuse rows of the final stage-4 module — those branches
    are dead code after the head and XLA removes them).
    """
    params = jax.tree.map(np.asarray, flax_vars["params"])
    stats = jax.tree.map(np.asarray, flax_vars["batch_stats"])
    imported = 0
    for path, conv_key, bn_prefix in _hrnet_pairs(config):
        if conv_key not in state_dict:
            if strict:
                raise KeyError(conv_key)
            continue
        _get(params, path)["conv"]["kernel"] = _conv_to_flax(
            state_dict[conv_key]
        ).astype(np.float32)
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        bn_p["scale"] = state_dict[f"{bn_prefix}.weight"].astype(np.float32)
        bn_p["bias"] = state_dict[f"{bn_prefix}.bias"].astype(np.float32)
        bn_s["mean"] = state_dict[f"{bn_prefix}.running_mean"].astype(
            np.float32
        )
        bn_s["var"] = state_dict[f"{bn_prefix}.running_var"].astype(
            np.float32
        )
        imported += 1
    if "final_layer.weight" in state_dict:
        params["head"]["kernel"] = _conv_to_flax(
            state_dict["final_layer.weight"]
        ).astype(np.float32)
        params["head"]["bias"] = state_dict["final_layer.bias"].astype(
            np.float32
        )
        imported += 1
    if imported == 0:
        raise ValueError("no tensors imported — wrong state_dict format?")
    return {"params": params, "batch_stats": stats}


def _higherhrnet_head_pairs(
    num_deconv_blocks: int = 4,
) -> List[Tuple[Tuple[str, ...], str, str]]:
    """ConvBN pairs for the deconv residual blocks of the official
    PoseHigherResolutionNet (`deconv_layers.0.{1+i}.0.*` — each BasicBlock
    sits inside its own nn.Sequential, hence the trailing `.0`)."""
    pairs: List[Tuple[Tuple[str, ...], str, str]] = []
    for i in range(num_deconv_blocks):
        base = f"deconv_layers.0.{1 + i}.0"
        for c in ("conv1", "conv2"):
            pairs.append(
                ((f"deconv_block{i}", c),
                 f"{base}.{c}.weight", f"{base}.bn{c[-1]}")
            )
    return pairs


def _deconv_to_flax(t: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, in, out) with spatial FLIP: torch's transposed conv is
    the conv adjoint, while flax/lax conv_transpose keeps the kernel
    unflipped — flip + 'SAME' padding reproduces torch k=4/s=2/p=1 exactly
    (verified to float32 round-off in tests)."""
    return np.ascontiguousarray(
        np.transpose(t[:, :, ::-1, ::-1], (2, 3, 0, 1))
    )


def _deconv_to_torch(t: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(t, (2, 3, 0, 1))[:, :, ::-1, ::-1]
    )


def import_torch_higherhrnet(
    state_dict: Dict[str, np.ndarray],
    flax_vars: Any,
    config: HRNetConfig = HRNET_W32,
    num_deconv_blocks: int = 4,
    strict: bool = False,
) -> Any:
    """Map an official PoseHigherResolutionNet state_dict onto our
    HigherHRNet tree: the trunk shares pose_hrnet naming (`_hrnet_pairs`),
    plus `final_layers.{0,1}` -> head1/head2, the deconv transpose-conv +
    BN, and the deconv residual blocks."""
    params = jax.tree.map(np.asarray, flax_vars["params"])
    stats = jax.tree.map(np.asarray, flax_vars["batch_stats"])
    imported = 0
    pairs = _hrnet_pairs(config) + _higherhrnet_head_pairs(num_deconv_blocks)
    for path, conv_key, bn_prefix in pairs:
        if conv_key not in state_dict:
            if strict:
                raise KeyError(conv_key)
            continue
        _get(params, path)["conv"]["kernel"] = _conv_to_flax(
            state_dict[conv_key]
        ).astype(np.float32)
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        bn_p["scale"] = state_dict[f"{bn_prefix}.weight"].astype(np.float32)
        bn_p["bias"] = state_dict[f"{bn_prefix}.bias"].astype(np.float32)
        bn_s["mean"] = state_dict[f"{bn_prefix}.running_mean"].astype(
            np.float32
        )
        bn_s["var"] = state_dict[f"{bn_prefix}.running_var"].astype(
            np.float32
        )
        imported += 1
    for torch_name, ours in (("final_layers.0", "head1"),
                             ("final_layers.1", "head2")):
        if f"{torch_name}.weight" in state_dict:
            params[ours]["kernel"] = _conv_to_flax(
                state_dict[f"{torch_name}.weight"]
            ).astype(np.float32)
            params[ours]["bias"] = state_dict[f"{torch_name}.bias"].astype(
                np.float32
            )
            imported += 1
    if "deconv_layers.0.0.0.weight" in state_dict:
        params["deconv"]["kernel"] = _deconv_to_flax(
            state_dict["deconv_layers.0.0.0.weight"]
        ).astype(np.float32)
        bn = "deconv_layers.0.0.1"
        params["deconv_bn"]["scale"] = state_dict[f"{bn}.weight"].astype(
            np.float32
        )
        params["deconv_bn"]["bias"] = state_dict[f"{bn}.bias"].astype(
            np.float32
        )
        stats["deconv_bn"]["mean"] = state_dict[
            f"{bn}.running_mean"
        ].astype(np.float32)
        stats["deconv_bn"]["var"] = state_dict[f"{bn}.running_var"].astype(
            np.float32
        )
        imported += 1
    if imported == 0:
        raise ValueError("no tensors imported — wrong state_dict format?")
    return {"params": params, "batch_stats": stats}


def export_torch_higherhrnet(
    flax_vars: Any,
    config: HRNetConfig = HRNET_W32,
    num_deconv_blocks: int = 4,
) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_higherhrnet` (round-trip/forward-
    equivalence validation; fine-tuned weights back to torch tooling)."""
    params = flax_vars["params"]
    stats = flax_vars["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    pairs = _hrnet_pairs(config) + _higherhrnet_head_pairs(num_deconv_blocks)
    for path, conv_key, bn_prefix in pairs:
        out[conv_key] = _conv_to_torch(
            np.asarray(_get(params, path)["conv"]["kernel"])
        )
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        out[f"{bn_prefix}.weight"] = np.asarray(bn_p["scale"])
        out[f"{bn_prefix}.bias"] = np.asarray(bn_p["bias"])
        out[f"{bn_prefix}.running_mean"] = np.asarray(bn_s["mean"])
        out[f"{bn_prefix}.running_var"] = np.asarray(bn_s["var"])
    for torch_name, ours in (("final_layers.0", "head1"),
                             ("final_layers.1", "head2")):
        out[f"{torch_name}.weight"] = _conv_to_torch(
            np.asarray(params[ours]["kernel"])
        )
        out[f"{torch_name}.bias"] = np.asarray(params[ours]["bias"])
    out["deconv_layers.0.0.0.weight"] = _deconv_to_torch(
        np.asarray(params["deconv"]["kernel"])
    )
    out["deconv_layers.0.0.1.weight"] = np.asarray(
        params["deconv_bn"]["scale"]
    )
    out["deconv_layers.0.0.1.bias"] = np.asarray(params["deconv_bn"]["bias"])
    out["deconv_layers.0.0.1.running_mean"] = np.asarray(
        stats["deconv_bn"]["mean"]
    )
    out["deconv_layers.0.0.1.running_var"] = np.asarray(
        stats["deconv_bn"]["var"]
    )
    return out


def export_torch_hrnet(
    flax_vars: Any, config: HRNetConfig = HRNET_W32
) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_hrnet` (used to validate the mapping by
    exact round trip; also lets our fine-tuned weights flow back to torch
    tooling)."""
    params = flax_vars["params"]
    stats = flax_vars["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    for path, conv_key, bn_prefix in _hrnet_pairs(config):
        out[conv_key] = _conv_to_torch(
            np.asarray(_get(params, path)["conv"]["kernel"])
        )
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        out[f"{bn_prefix}.weight"] = np.asarray(bn_p["scale"])
        out[f"{bn_prefix}.bias"] = np.asarray(bn_p["bias"])
        out[f"{bn_prefix}.running_mean"] = np.asarray(bn_s["mean"])
        out[f"{bn_prefix}.running_var"] = np.asarray(bn_s["var"])
    out["final_layer.weight"] = _conv_to_torch(
        np.asarray(params["head"]["kernel"])
    )
    out["final_layer.bias"] = np.asarray(params["head"]["bias"])
    return out
