"""Model repository: serialize/restore the fused pipeline as an artifact.

The reference's deployable unit is a Triton model repository — directories
of SavedModel/ONNX/TensorRT blobs plus config.pbtxt, built offline by
`models/conv.py` and loaded by name (README :13-26, :71-80). The
TPU-native equivalent is one directory holding:

    pipeline.stablehlo   the fused program exported via jax.export
                         (portable StableHLO, weights passed at call time)
    meta.json            batch size / shapes / config provenance
    det/  pose/          orbax checkpoints of the variable collections

A server can restore and run it without the model-building Python code
(the StableHLO is the compiled-graph artifact; weights stay swappable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models import weights as W

# artifact directory layout version; bump on layout/meta schema breaks.
# Restore refuses artifacts from a NEWER writer (the Triton analog:
# config.pbtxt `platform`/version gating on model load).
FORMAT_VERSION = 1


def export_serving_artifact(
    pipeline, directory: str, batch_size: int = 16
) -> str:
    """Export the packed serving program + weights for `batch_size`.

    Accepts either serving pipeline: `InferencePipeline` (top-down
    det+pose, the default) or `BottomUpPipeline` (HigherHRNet + AE
    grouping — no detector collection; mode recorded in meta.json)."""
    from jax import export as jexport

    cfg = pipeline.config
    os.makedirs(directory, exist_ok=True)

    b = batch_size
    if not hasattr(pipeline, "det_vars"):
        return _export_bottomup(pipeline, directory, b)
    p = cfg.detector.max_persons
    args = (
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.device_get(pipeline.det_vars),
        ),
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.device_get(pipeline.pose_vars),
        ),
        jax.ShapeDtypeStruct(
            (b, cfg.detector.input_height, cfg.detector.input_width, 3),
            jnp.uint8,
        ),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b, p), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
    )
    exported = jexport.export(jax.jit(pipeline.fused.forward_serving))(*args)
    with open(os.path.join(directory, "pipeline.stablehlo"), "wb") as f:
        f.write(exported.serialize())

    W.save_pipeline_checkpoint(
        directory,
        jax.device_get(pipeline.det_vars),
        jax.device_get(pipeline.pose_vars),
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "batch_size": b,
        "max_persons": p,
        "detector_input_hw": [cfg.detector.input_height,
                              cfg.detector.input_width],
        "pose_crop_hw": [cfg.pose.crop_height, cfg.pose.crop_width],
        "packed_layout": "valid | lengths_cm[11] | seg_visible[11]",
        "config": dataclasses.asdict(cfg),
        # real|random per model slot, propagated so a server loading the
        # artifact can keep the random-weight guardrail honest
        "weights_origin": dict(
            getattr(pipeline, "weights_origin",
                    {"detector": "unknown", "pose": "unknown"})
        ),
    }
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return directory


def _export_bottomup(pipeline, directory: str, b: int) -> str:
    """Bottom-up variant: program signature
    (pose_vars, images [b,H,W,3] u8, heights [b,P], orig_hw [b,2])."""
    from jax import export as jexport

    cfg = pipeline.config
    p = pipeline.max_people
    h, w = pipeline.INPUT_HW
    args = (
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.device_get(pipeline.pose_vars),
        ),
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((b, p), jnp.float32),
        jax.ShapeDtypeStruct((b, 2), jnp.float32),
    )
    exported = jexport.export(jax.jit(pipeline.forward_serving))(*args)
    with open(os.path.join(directory, "pipeline.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    W.save_pose_checkpoint(directory, jax.device_get(pipeline.pose_vars))
    meta = {
        "format_version": FORMAT_VERSION,
        "mode": "bottom_up",
        "batch_size": b,
        "max_persons": p,
        "input_hw": [h, w],
        "grouping": {
            "max_cands": pipeline.max_cands,
            "tag_threshold": pipeline.tag_threshold,
            "score_threshold": pipeline.score_threshold,
        },
        "packed_layout": "valid | lengths_cm[11] | seg_visible[11]",
        "config": dataclasses.asdict(cfg),
        "weights_origin": dict(pipeline.weights_origin),
    }
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return directory


class ServingArtifact:
    """Restored artifact: callable packed serving program + its weights.

    `mesh`: data-parallel serving of the restored program. The exported
    StableHLO is single-device-shaped on purpose (its batch_size is the
    PER-DEVICE batch); under a mesh the program body is wrapped in
    shard_map over the 'data' axis — weights replicated, batch args
    split — so one artifact serves any dp degree (effective batch =
    batch_size x data-axis size). Exporting with baked-in shardings would
    instead pin the artifact to one device count. This is the Triton
    model-repo `instance_group { count: N }` analog (reference README
    :47-80) expressed as SPMD over ICI rather than N engine replicas.
    """

    def __init__(self, directory: str, mesh=None):
        from jax import export as jexport

        with open(os.path.join(directory, "pipeline.stablehlo"), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(os.path.join(directory, "meta.json")) as f:
            self.meta = json.load(f)
        v = self.meta.get("format_version", 1)
        if v > FORMAT_VERSION:
            raise ValueError(
                f"artifact {directory} has format_version {v}; this "
                f"build reads <= {FORMAT_VERSION} — re-export with this "
                "build or upgrade it"
            )
        self.mode = self.meta.get("mode", "top_down")
        if self.mode == "bottom_up":
            self.det_vars = None
            self.pose_vars = W.load_pose_checkpoint(directory)
        else:
            self.det_vars, self.pose_vars = W.load_pipeline_checkpoint(
                directory
            )
        self.mesh = mesh
        self._sharded_call = None
        if mesh is not None:
            self._sharded_call = self._build_sharded_call(mesh)

    def _build_sharded_call(self, mesh):
        from jax.sharding import PartitionSpec as P

        n_weight_args = 1 if self.mode == "bottom_up" else 2
        n_batch_args = 3 if self.mode == "bottom_up" else 4
        in_specs = (P(),) * n_weight_args + (P("data"),) * n_batch_args
        return jax.jit(jax.shard_map(
            self._exported.call,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P("data"),
            # the per-shard body is an opaque exported call; replication
            # of the packed output can't be inferred through it
            check_vma=False,
        ))

    @property
    def batch_size(self) -> int:
        """Per-device batch the StableHLO program was exported for."""
        return self.meta["batch_size"]

    @property
    def effective_batch(self) -> int:
        """Rows one call consumes: batch_size x dp degree."""
        if self.mesh is None:
            return self.batch_size
        return self.batch_size * self.mesh.shape["data"]

    def __call__(
        self,
        images: np.ndarray,      # [effective_batch, H, W, 3] uint8
        thresholds: np.ndarray,  # [effective_batch]; ignored in bottom_up
        heights: np.ndarray,     # [effective_batch, P]
        orig_hw: np.ndarray,     # [effective_batch, 2]
    ) -> np.ndarray:
        call = self._sharded_call or self._exported.call
        if self.mode == "bottom_up":
            out = call(
                self.pose_vars, jnp.asarray(images),
                jnp.asarray(heights, jnp.float32),
                jnp.asarray(orig_hw, jnp.float32),
            )
        else:
            out = call(
                self.det_vars, self.pose_vars,
                jnp.asarray(images), jnp.asarray(thresholds, jnp.float32),
                jnp.asarray(heights, jnp.float32),
                jnp.asarray(orig_hw, jnp.float32),
            )
        return np.asarray(out)


class ArtifactPipeline:
    """Serve directly from an exported artifact directory.

    The load-side half of the Triton model-repository analog: where the
    reference's server points Triton at `/cv_root/models` and serves
    whatever blobs + config.pbtxt it finds (README.md:47-80), this object
    restores the StableHLO program + orbax weights + config written by
    `export_serving_artifact` and presents the `InferencePipeline` serving
    surface (`infer_serving` / `config` / `weights_origin` / `stages`), so
    `serve.server --artifact-dir <dir>` runs WITHOUT the model-building
    Python code ever tracing a model.

    The exported program has one fixed batch size; requests are padded (and
    oversize batches chunked) to it, unlike the live pipeline's power-of-2
    buckets. With `mesh`, the restored program is dp-sharded over the
    'data' axis (see ServingArtifact) and the fixed batch becomes
    batch_size x dp degree.
    """

    def __init__(self, directory: str, mesh=None):
        from human_body_proportion_estimation_tpu.utils.config import (
            config_from_dict,
        )

        self.artifact = ServingArtifact(directory, mesh=mesh)
        self.config = config_from_dict(self.artifact.meta["config"])
        self.weights_origin = dict(
            self.artifact.meta.get(
                "weights_origin",
                {"detector": "unknown", "pose": "unknown"},
            )
        )
        self.stages = None  # ServingApp attaches a StageTimer
        self.mesh = mesh

    def infer_serving(
        self,
        images_rgb,
        person_heights=175.0,
        det_threshold: float | list = 0.70,
    ) -> np.ndarray:
        """Packed [n, P, 23] rows, same contract as
        `InferencePipeline.infer_serving`."""
        import contextlib

        from human_body_proportion_estimation_tpu.pipeline import host

        stage = self.stages.stage if self.stages is not None else (
            lambda _name: contextlib.nullcontext()
        )
        b = self.artifact.effective_batch
        rows = []
        for start in range(0, len(images_rgb), b):
            chunk = images_rgb[start:start + b]

            def per_chunk(v):
                if np.isscalar(v):
                    return v
                return v[start:start + b]

            with stage("host_prepare"):
                if self.artifact.mode == "bottom_up":
                    from human_body_proportion_estimation_tpu.pipeline import (
                        bottomup,
                    )

                    meta = self.artifact.meta
                    batch, heights, orig_hw, n = (
                        bottomup.prepare_batch_bottomup(
                            chunk, per_chunk(person_heights), b,
                            meta["max_persons"], tuple(meta["input_hw"]),
                        )
                    )
                    thresholds = np.zeros((b,), np.float32)  # unused
                else:
                    batch, thresholds, heights, orig_hw, n = (
                        host.prepare_batch(
                            self.config, chunk, per_chunk(person_heights),
                            per_chunk(det_threshold), b,
                        )
                    )
            with stage("device_compute_readback"):
                rows.append(self.artifact(
                    batch, thresholds, heights, orig_hw
                )[:n])
        return np.concatenate(rows, axis=0)
