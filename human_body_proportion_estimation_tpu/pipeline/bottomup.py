"""Bottom-up multi-person pipeline: one HigherHRNet pass over the whole
image, associative-embedding grouping instead of a detector.

Capability BEYOND the reference: it serves HigherHRNet only through the
top-down path (crop per detected person, read the "output_2" heatmaps,
`pose_est_hrnet_trtserver.py:22-28`) and discards the AE tags entirely.
Here the train-time head's tags ("output_1", models/higherhrnet.py) drive
the full bottom-up decode (ops/ae_grouping.py), so multi-person pose costs
ONE model pass per image regardless of person count — no detector, no
per-person crops. The whole path (model -> heatmap aggregation -> peak
NMS -> greedy grouping -> proportions) is a single fixed-shape jit
program, batched via vmap.

Input sizing follows the reference's fixed 512x512 fallback for
dynamic-shaped pose models (`pose_est_hrnet_trtserver.py:51-52`).

Heatmap aggregation (standard HigherHRNet eval): the 1/4-res "output_1"
heatmaps are bilinearly upsampled to 1/2 res and averaged with "output_2";
tags are upsampled alongside.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.higherhrnet import (
    HigherHRNet,
)
from human_body_proportion_estimation_tpu.ops import (
    ae_grouping as ae,
    heatmap as hm_ops,
    proportions as prop_ops,
)
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig


class BottomUpOutputs(NamedTuple):
    boxes_orig: jax.Array     # [B, P, 4] yxyx keypoint bbox, original px
    person_valid: jax.Array   # [B, P] bool
    keypoints: jax.Array      # [B, P, 17, 2] (x, y) original-image px
    kp_scores: jax.Array      # [B, P, 17]
    kp_visible: jax.Array     # [B, P, 17] bool
    lengths_cm: jax.Array     # [B, P, 11]
    seg_visible: jax.Array    # [B, P, 11] bool


def prepare_batch_bottomup(images_rgb, person_heights, b: int, p: int,
                           input_hw) -> tuple:
    """Host-side batch assembly to a FIXED batch size `b` (no detector
    inputs — the bottom-up program takes only images/heights/orig_hw).
    Same per-request height semantics as `host.prepare_batch`."""
    from human_body_proportion_estimation_tpu.pipeline.host import (
        resize_for_detector,
    )

    n = len(images_rgb)
    if n > b:
        raise ValueError(f"{n} images exceed fixed batch size {b}")
    h, w = input_hw
    batch = np.zeros((b, h, w, 3), np.uint8)
    orig_hw = np.ones((b, 2), np.float32)
    heights = np.full((b, p), 175.0, np.float32)
    for i, img in enumerate(images_rgb):
        batch[i] = resize_for_detector(img, w, h)
        orig_hw[i] = img.shape[:2]
        hi = person_heights
        if np.isscalar(hi):
            heights[i, :] = float(hi)
        else:
            per_img = hi[i] if isinstance(hi[i], (list, tuple)) else hi
            for slot in range(p):
                heights[i, slot] = float(
                    per_img[min(slot, len(per_img) - 1)]
                )
    return batch, heights, orig_hw, n


class BottomUpPipeline:
    """Owns the HigherHRNet slot + the fused bottom-up program."""

    INPUT_HW = (512, 512)   # reference pose driver fallback (:51-52)

    def __init__(
        self,
        config: PipelineConfig | None = None,
        pose_vars: Any | None = None,
        max_people: int | None = None,
        max_cands: int = 8,
        tag_threshold: float = 1.0,
        score_threshold: float = 0.1,
        person_score_threshold: float = 0.25,
        rng_seed: int = 0,
        mesh=None,
        dtype=None,
        model=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — serving
        batches are then sharded over it with replicated params, the same
        dp scaling as InferencePipeline(mesh=...). `dtype`: compute dtype
        override (default bf16; f32 for numerics-sensitive comparisons).
        `model`: HigherHRNet instance override (reduced-shape certification
        smoke uses a tiny config; see cli/certify_bottomup.py)."""
        self.config = config or PipelineConfig()
        self.max_people = max_people or self.config.detector.max_persons
        self.max_cands = max_cands
        self.tag_threshold = tag_threshold
        self.score_threshold = score_threshold
        # person-level mean-score gate (ops/ae_grouping.group_keypoints):
        # kills phantom groups opened by stray sub-peaks; trained peak
        # amplitudes sit near 1.0, noise groups near score_threshold
        self.person_score_threshold = person_score_threshold
        self.model = model if model is not None else (
            HigherHRNet() if dtype is None else HigherHRNet(dtype=dtype)
        )
        pose_vars_given = pose_vars is not None
        if pose_vars is None:
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                pose_vars = self.model.init(
                    jax.random.PRNGKey(rng_seed),
                    jnp.zeros((1, *self.INPUT_HW, 3), jnp.float32),
                )
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.pose_vars = jax.device_put(
                pose_vars, NamedSharding(mesh, P())
            )
            self._data_sharding = NamedSharding(mesh, P("data"))
        else:
            self.pose_vars = jax.device_put(
                pose_vars, jax.local_devices()[0]
            )
            self._data_sharding = None
        self._program = None
        self._serving = None
        # serving-edge integration (mirrors InferencePipeline's contract):
        # /health weight provenance + optional /metrics stage timer
        self.weights_origin = {"pose": "real" if pose_vars_given else "random"}
        self.stages = None
        if self.weights_origin["pose"] == "random":
            from human_body_proportion_estimation_tpu.utils.logging import (
                get_logger,
            )

            get_logger("pipeline").warning(
                "random_weights",
                msg="RANDOM-INIT HigherHRNet IN USE — bottom-up outputs are "
                    "garbage; pass pose_vars",
                **self.weights_origin,
            )

    # ------------------------------------------------------------------ #

    def forward(
        self,
        pose_vars: Any,
        images: jax.Array,        # [B, 512, 512, 3] uint8 RGB
        person_heights: jax.Array,  # [B, P] cm
        orig_hw: jax.Array,       # [B, 2]
    ) -> BottomUpOutputs:
        cfg = self.config
        k = cfg.pose.num_keypoints
        x = images.astype(jnp.float32) / 255.0
        outs = self.model.apply(pose_vars, x)
        out1, out2 = outs["output_1"], outs["output_2"]
        hm_half = out2                                   # [B, H/2, W/2, K]
        b, hh, hw = hm_half.shape[:3]
        up = functools.partial(
            jax.image.resize, shape=(b, hh, hw, k), method="bilinear"
        )
        heat = (up(out1[..., :k]) + hm_half) / 2.0
        tags = up(out1[..., k:])

        decode = functools.partial(
            ae.decode_bottom_up,
            max_people=self.max_people,
            max_cands=self.max_cands,
            score_threshold=self.score_threshold,
            tag_threshold=self.tag_threshold,
            person_score_threshold=self.person_score_threshold,
        )
        # ae ops take [K, H, W]
        grouped = jax.vmap(decode)(
            jnp.moveaxis(heat, -1, 1), jnp.moveaxis(tags, -1, 1)
        )

        # heatmap-space -> original-image coords
        scale = orig_hw[:, None, None, ::-1] / jnp.asarray(
            [[[[hw, hh]]]], jnp.float32
        )                                                  # [B,1,1,2] (x,y)
        kp_img = grouped.keypoints * scale
        kp_visible = (
            hm_ops.gate_keypoints(
                grouped.scores, cfg.pose.keypoint_thresholds
            )
            & (grouped.scores > 0)
        )

        # person bbox from visible joints (for pixel->cm scaling and the
        # response's box field; the reference derives scale from the
        # detector bbox, person_det_pose_edet4_trtserver.py:166-168 —
        # bottom-up has no detector, so the keypoint extent stands in)
        big = jnp.float32(1e9)
        xs = jnp.where(kp_visible, kp_img[..., 0], big)
        ys = jnp.where(kp_visible, kp_img[..., 1], big)
        x1, y1 = xs.min(axis=-1), ys.min(axis=-1)
        xs = jnp.where(kp_visible, kp_img[..., 0], -big)
        ys = jnp.where(kp_visible, kp_img[..., 1], -big)
        x2, y2 = xs.max(axis=-1), ys.max(axis=-1)
        person_valid = grouped.valid & (kp_visible.sum(axis=-1) >= 2)
        boxes = jnp.where(
            person_valid[..., None],
            jnp.stack([y1, x1, y2, x2], axis=-1),
            0.0,
        )

        pixel_height = jnp.maximum(y2 - y1, 1.0)
        pixel_to_cm = person_heights / pixel_height
        seg = prop_ops.segment_lengths(kp_img, kp_visible, pixel_to_cm)
        seg_visible = seg.visible & person_valid[..., None]
        return BottomUpOutputs(
            boxes_orig=boxes,
            person_valid=person_valid,
            keypoints=kp_img,
            kp_scores=grouped.scores,
            kp_visible=kp_visible,
            lengths_cm=jnp.where(seg_visible, seg.lengths_cm, 0.0),
            seg_visible=seg_visible,
        )

    def forward_serving(
        self, pose_vars, images, person_heights, orig_hw
    ) -> jax.Array:
        """Packed [B, P, 23] (valid | 11 lengths | 11 visibility) — the
        same single-readback serving layout as the top-down pipeline
        (FusedPipeline.forward_serving), so the HTTP/gRPC edge and the
        deadline batcher serve both pipelines interchangeably."""
        out = self.forward(pose_vars, images, person_heights, orig_hw)
        return jnp.concatenate(
            [
                out.person_valid.astype(jnp.float32)[..., None],
                out.lengths_cm,
                out.seg_visible.astype(jnp.float32),
            ],
            axis=-1,
        )

    def infer_serving(
        self,
        images_rgb: Sequence[np.ndarray],
        person_heights: Sequence[float] | float = 175.0,
        det_threshold=0.70,  # accepted for edge-interface parity; the
        # bottom-up path has no detector — visibility is governed by the
        # heatmap-peak score_threshold instead
    ) -> np.ndarray:
        import contextlib

        stage = self.stages.stage if self.stages is not None else (
            lambda _name: contextlib.nullcontext()
        )
        with stage("host_prepare"):
            batch, heights, orig_hw, n = self._prepare(
                images_rgb, person_heights
            )
        with stage("device_upload"):
            dev_batch = jnp.asarray(batch)
            dev_args = (jnp.asarray(heights), jnp.asarray(orig_hw))
            jax.block_until_ready(dev_batch)
        with stage("device_compute_readback"):
            if self._serving is None:
                self._serving = jax.jit(
                    self.forward_serving, **self._jit_kwargs()
                )
            packed = np.asarray(
                self._serving(self.pose_vars, dev_batch, *dev_args)
            )
        return packed[:n]

    def _jit_kwargs(self):
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        return {
            "in_shardings": (
                jax.tree.map(lambda _: rep, self.pose_vars),
                NamedSharding(self.mesh, P("data", None, None, None)),
                NamedSharding(self.mesh, P("data", None)),
                NamedSharding(self.mesh, P("data", None)),
            ),
        }

    def _prepare(self, images_rgb, person_heights):
        from human_body_proportion_estimation_tpu.pipeline.host import (
            _pad_batch,
        )

        n = len(images_rgb)
        b = _pad_batch(n, self.config.serve.max_batch)
        if self.mesh is not None:
            dp = self.mesh.shape["data"]
            b = -(-max(b, dp) // dp) * dp  # data-shard multiple
        return prepare_batch_bottomup(
            images_rgb, person_heights, b, self.max_people, self.INPUT_HW
        )

    # ------------------------------------------------------------------ #

    def infer_images(
        self,
        images_rgb: Sequence[np.ndarray],
        person_heights: Sequence[float] | float = 175.0,
    ) -> BottomUpOutputs:
        """Host path: resize to 512x512, pad batch, run, fetch."""
        from human_body_proportion_estimation_tpu.pipeline.host import (
            resize_for_detector,
        )

        if self._program is None:
            self._program = jax.jit(self.forward)
        n = len(images_rgb)
        h, w = self.INPUT_HW
        p = self.max_people
        batch = np.zeros((n, h, w, 3), np.uint8)
        orig_hw = np.ones((n, 2), np.float32)
        heights = np.full((n, p), 175.0, np.float32)
        for i, img in enumerate(images_rgb):
            batch[i] = resize_for_detector(img, w, h)
            orig_hw[i] = img.shape[:2]
            hi = person_heights
            heights[i, :] = float(hi if np.isscalar(hi) else hi[i])
        out = self._program(
            self.pose_vars, jnp.asarray(batch), jnp.asarray(heights),
            jnp.asarray(orig_hw),
        )
        return jax.tree.map(np.asarray, out)
