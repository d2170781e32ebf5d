"""YOLOv5 torch checkpoint <-> flax converter.

The reference runs upstream YOLOv5 s/m weights (ONNX-exported from the
official torch release) inside Triton/onnxruntime. This converter maps the
official torch module naming (v6.0 layout: `model.{idx}.{...}`) onto
`models/yolov5.py`'s flax tree. Like the HRNet converter it is validated by
an exact export/import round trip plus forward equivalence — no torch
runtime needed (state_dict values as numpy).

Official layer indices (v6.0 yaml) -> our module names:
  0 stem | 1 down1 | 2 c3_1 | 3 down2 | 4 c3_2 | 5 down3 | 6 c3_3
  | 7 down4 | 8 c3_4 | 9 sppf | 10 head_cv1 | 13 head_c3_1 | 14 head_cv2
  | 17 head_c3_2 | 18 head_cv3 | 20 head_c3_3 | 21 head_cv4 | 23 head_c3_4
  | 24 Detect (m.0/1/2 -> detect0/1/2)
(11/15 Upsample and 12/16/19/22 Concat own no parameters.)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from human_body_proportion_estimation_tpu.models.yolov5 import (
    YOLOV5M,
    YoloV5Config,
)

# (our module name, torch index, kind) — kind: "conv" = ConvBnSiLU,
# "c3" = C3 block, "sppf" = SPPF
_LAYOUT: List[Tuple[str, int, str]] = [
    ("stem", 0, "conv"),
    ("down1", 1, "conv"),
    ("c3_1", 2, "c3"),
    ("down2", 3, "conv"),
    ("c3_2", 4, "c3"),
    ("down3", 5, "conv"),
    ("c3_3", 6, "c3"),
    ("down4", 7, "conv"),
    ("c3_4", 8, "c3"),
    ("sppf", 9, "sppf"),
    ("head_cv1", 10, "conv"),
    ("head_c3_1", 13, "c3"),
    ("head_cv2", 14, "conv"),
    ("head_c3_2", 17, "c3"),
    ("head_cv3", 18, "conv"),
    ("head_c3_3", 20, "c3"),
    ("head_cv4", 21, "conv"),
    ("head_c3_4", 23, "c3"),
]
# base C3 depths per slot (scaled by config.depth)
_C3_BASE_DEPTH = {
    "c3_1": 3, "c3_2": 6, "c3_3": 9, "c3_4": 3,
    "head_c3_1": 3, "head_c3_2": 3, "head_c3_3": 3, "head_c3_4": 3,
}


def _convbn_pairs(cfg: YoloV5Config):
    """[(flax ConvBnSiLU path, torch prefix)] for every conv+bn pair."""
    pairs: List[Tuple[Tuple[str, ...], str]] = []
    for name, idx, kind in _LAYOUT:
        t = f"model.{idx}"
        if kind == "conv":
            pairs.append(((name,), t))
        elif kind == "sppf":
            pairs.append(((name, "cv1"), f"{t}.cv1"))
            pairs.append(((name, "cv2"), f"{t}.cv2"))
        else:  # c3
            for cv in ("cv1", "cv2", "cv3"):
                pairs.append(((name, cv), f"{t}.{cv}"))
            for k in range(cfg.depth(_C3_BASE_DEPTH[name])):
                pairs.append(((name, f"m{k}", "cv1"), f"{t}.m.{k}.cv1"))
                pairs.append(((name, f"m{k}", "cv2"), f"{t}.m.{k}.cv2"))
    return pairs


def _get(tree: Dict, path: Tuple[str, ...]) -> Dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def _to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _to_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def import_torch_yolov5(
    state_dict: Dict[str, np.ndarray],
    flax_vars: Any,
    config: YoloV5Config = YOLOV5M,
    strict: bool = True,
) -> Any:
    """Official torch state_dict (numpy values) -> our variables tree."""
    import jax

    params = jax.tree.map(np.asarray, flax_vars["params"])
    stats = jax.tree.map(np.asarray, flax_vars["batch_stats"])
    for path, t in _convbn_pairs(config):
        if f"{t}.conv.weight" not in state_dict:
            if strict:
                raise KeyError(f"{t}.conv.weight")
            continue
        _get(params, path)["conv"]["kernel"] = _to_flax(
            state_dict[f"{t}.conv.weight"]
        ).astype(np.float32)
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        bn_p["scale"] = state_dict[f"{t}.bn.weight"].astype(np.float32)
        bn_p["bias"] = state_dict[f"{t}.bn.bias"].astype(np.float32)
        bn_s["mean"] = state_dict[f"{t}.bn.running_mean"].astype(np.float32)
        bn_s["var"] = state_dict[f"{t}.bn.running_var"].astype(np.float32)
    for li in range(3):
        params[f"detect{li}"]["kernel"] = _to_flax(
            state_dict[f"model.24.m.{li}.weight"]
        ).astype(np.float32)
        params[f"detect{li}"]["bias"] = state_dict[
            f"model.24.m.{li}.bias"
        ].astype(np.float32)
    return {"params": params, "batch_stats": stats}


def export_torch_yolov5(
    flax_vars: Any, config: YoloV5Config = YOLOV5M
) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip validation + torch-tooling export)."""
    params = flax_vars["params"]
    stats = flax_vars["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    for path, t in _convbn_pairs(config):
        out[f"{t}.conv.weight"] = _to_torch(
            np.asarray(_get(params, path)["conv"]["kernel"])
        )
        bn_p = _get(params, path)["bn"]
        bn_s = _get(stats, path)["bn"]
        out[f"{t}.bn.weight"] = np.asarray(bn_p["scale"])
        out[f"{t}.bn.bias"] = np.asarray(bn_p["bias"])
        out[f"{t}.bn.running_mean"] = np.asarray(bn_s["mean"])
        out[f"{t}.bn.running_var"] = np.asarray(bn_s["var"])
    for li in range(3):
        out[f"model.24.m.{li}.weight"] = _to_torch(
            np.asarray(params[f"detect{li}"]["kernel"])
        )
        out[f"model.24.m.{li}.bias"] = np.asarray(
            params[f"detect{li}"]["bias"]
        )
    return out
