"""The fused image -> body-proportions pipeline as ONE XLA program.

This is the TPU-native replacement for the reference's entire serving core:
Triton's ensemble DAG (`ensemble_edet4_person_det_pose`) chaining the
`edetlite4_modified` TF graph (person filter -> top-3 -> bbox expand ->
crop_and_resize -> NCHW, reference `models/conv.py:14-86`) into HRNet, plus
the host-side numpy decode loop
(`person_det_pose_edet4_trtserver.py:148-171`). Where the reference crosses
a gRPC process boundary twice and loops per person in Python, here the whole
path

    uint8 image -> normalize -> EfficientDet -> person filter/top-3
    -> bbox expand -> crop 384x288 -> HRNet -> heatmap argmax decode
    -> confidence gating -> coord remap -> pixel->cm -> 11 segment lengths

is a single jit-compiled fixed-shape program: persons are padded to
`max_persons` slots (3, conv.py:35) with validity masks, so batches of
images run data-parallel with zero host round-trips.

Coordinate spaces (mirroring the serving path where `save_result_dir is
None`): detection + crops live in det-input space (640x480); emitted
keypoints / pixel heights are de-normalized to the ORIGINAL image size
(reference `person_det_pose_edet4_trtserver.py:142-145`), passed per-image
as `orig_hw`.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.hrnet import HRNet
from human_body_proportion_estimation_tpu.ops import (
    boxes as box_ops,
    crop as crop_ops,
    heatmap as hm_ops,
    proportions as prop_ops,
)
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig


class PipelineOutputs(NamedTuple):
    """Fixed-shape device outputs for a batch of B images."""

    boxes_norm: jax.Array     # [B, P, 4] normalized yxyx (expanded), P=3
    boxes_orig: jax.Array     # [B, P, 4] yxyx in ORIGINAL image pixels
    person_valid: jax.Array   # [B, P] bool
    det_scores: jax.Array     # [B, P] person detection scores
    keypoints: jax.Array      # [B, P, 17, 2] (x, y) in ORIGINAL image px
    kp_scores: jax.Array      # [B, P, 17] heatmap confidences
    kp_visible: jax.Array     # [B, P, 17] bool (threshold-gated)
    lengths_cm: jax.Array     # [B, P, 11]
    seg_visible: jax.Array    # [B, P, 11] bool
    heatmaps: jax.Array | None  # [B, P, 17, 96, 72] (debug/parity variant)


def select_persons(
    boxes_yxyx: jax.Array,
    scores: jax.Array,
    classes: jax.Array,
    valid: jax.Array,
    det_threshold: jax.Array,
    person_class_id: int,
    max_persons: int,
):
    """Person-class filter + score threshold + top-K slots.

    Same semantics as the in-graph filter of reference `models/conv.py:22-35`
    (class == person, score >= threshold, first 3 — detector outputs are
    already score-sorted).
    """
    is_person = (
        valid
        & (classes == float(person_class_id))
        & (scores >= det_threshold)
    )
    masked = jnp.where(is_person, scores, 0.0)
    top_scores, idx = jax.lax.top_k(masked, max_persons)
    slot_valid = top_scores > 0.0
    return boxes_yxyx[idx], top_scores, slot_valid


class FusedPipeline:
    """Builds jittable fused programs for a static (backend, pose) pair.

    The detector slot is any backend from `pipeline/backends.py` (a callable
    mapping one det-input image to padded person slots inside the jit
    program). Parameters (flax variable collections) are pytree arguments,
    so weight updates don't recompile; image batch size is the only shape
    axis that triggers a new compilation.
    """

    def __init__(
        self,
        config: PipelineConfig,
        detector_backend,
        pose: HRNet,
        sharded: bool = False,
        mesh=None,
    ):
        """`mesh`: the serving Mesh when the program will be jitted with
        the batch sharded over its 'data' axis — pallas_call has no SPMD
        partitioning rule, so on TPU the Pallas decode is then wrapped in
        shard_map over 'data' (see ops/pallas_kernels). `sharded` without
        a mesh keeps the plain XLA decode (CPU-mesh certification runs)."""
        self.config = config
        self.detector_backend = detector_backend
        self.pose = pose
        self.mesh = mesh
        self.sharded = sharded or mesh is not None

    def forward(
        self,
        det_vars: Any,
        pose_vars: Any,
        images: jax.Array,       # [B, H, W, 3] uint8 RGB (det input size)
        det_threshold: jax.Array,  # [B] f32 (per request, batched serving)
        person_heights: jax.Array,  # [B, P] cm
        orig_hw: jax.Array,      # [B, 2] original (h, w) per image
        with_heatmaps: bool = False,
    ) -> PipelineOutputs:
        """The fused program. jit with static `with_heatmaps`."""
        cfg = self.config
        h, w = cfg.detector.input_height, cfg.detector.input_width
        p = cfg.detector.max_persons
        b = images.shape[0]

        images_f32 = images.astype(jnp.float32)

        # -- detection (vmapped over batch) --
        boxes_px, det_scores, person_valid = jax.vmap(
            functools.partial(self.detector_backend, det_vars)
        )(images_f32, det_threshold)

        # -- bbox expand + normalize (reference conv.py:39-57; x expand
        #    w//17, y expand 0: person_det_pose_edet4_trtserver.py:116-117) --
        boxes_norm = box_ops.expand_clip_normalize_yxyx(
            boxes_px,
            jnp.float32(cfg.x_expand),
            jnp.float32(0.0),
            h,
            w,
        )

        # -- person crops from the /255 image (conv.py:59-70). Precision
        #    HIGH (bf16x3 passes) instead of the op's exact HIGHEST
        #    default: measured max |err| 4e-5 on /255 inputs — two orders
        #    below the bf16 cast HRNet's first conv applies anyway — for
        #    4.4 -> 2.6 ms at b32x3 (scripts/probe_crop.py; gather-based
        #    variants measured SLOWER, 5.8/11.3 ms). On CPU (parity/mesh
        #    certification) precision is ignored and stays f32-exact --
        crops = jax.vmap(
            lambda img, bx: crop_ops.crop_and_resize(
                img, bx, cfg.pose.crop_height, cfg.pose.crop_width,
                precision=jax.lax.Precision.HIGH,
            )
        )(images_f32 / 255.0, boxes_norm)          # [B, P, 384, 288, 3]

        # -- pose estimation over all slots at once --
        crops_flat = crops.reshape(
            b * p, cfg.pose.crop_height, cfg.pose.crop_width, 3
        )
        heatmaps_nhwc = self.pose.apply(pose_vars, crops_flat)
        hm_h, hm_w = heatmaps_nhwc.shape[1:3]
        heatmaps = jnp.moveaxis(heatmaps_nhwc, -1, 1).reshape(
            b, p, cfg.pose.num_keypoints, hm_h, hm_w
        )

        # -- decode + gate (pose_estimator.py:75-99, driver :162-163);
        #    the Pallas kernel fuses the per-slot argmax on TPU; under a
        #    mesh it runs per-'data'-shard via shard_map (B is the sharded
        #    dim; the P person slots fold in per-shard), and a sharded jit
        #    WITHOUT a mesh (CPU certification) keeps the XLA decode --
        if jax.devices()[0].platform == "tpu" and (
            not self.sharded or self.mesh is not None
        ):
            from human_body_proportion_estimation_tpu.ops.pallas_kernels import (
                decode_heatmaps_pallas,
            )

            kp_flat, sc_flat = decode_heatmaps_pallas(
                heatmaps.reshape(b * p, cfg.pose.num_keypoints, hm_h, hm_w),
                mesh=self.mesh,
            )
            kp_hm = kp_flat.reshape(b, p, cfg.pose.num_keypoints, 2)
            kp_scores = sc_flat.reshape(b, p, cfg.pose.num_keypoints)
        else:
            kp_hm, kp_scores = hm_ops.decode_heatmaps(heatmaps)
        if cfg.pose.subpixel_refine:
            kp_hm = hm_ops.refine_subpixel(kp_hm, heatmaps)
        kp_visible = hm_ops.gate_keypoints(
            kp_scores, cfg.pose.keypoint_thresholds
        )

        # -- de-normalize boxes to ORIGINAL image space + remap keypoints
        #    (driver :142-145, :151-160) --
        scale = jnp.concatenate([orig_hw, orig_hw], axis=-1)  # [B,4] hwhw
        boxes_orig = boxes_norm * scale[:, None, :]
        kp_img = hm_ops.remap_to_image(kp_hm, boxes_orig, (hm_h, hm_w))

        # -- pixel->cm + segments (driver :166-168, pose_estimator :191-200) --
        bt = jnp.trunc(boxes_orig)
        pixel_height = bt[..., 2] - bt[..., 0]
        pixel_to_cm = person_heights / jnp.maximum(pixel_height, 1.0)
        seg = prop_ops.segment_lengths(kp_img, kp_visible, pixel_to_cm)
        seg_visible = seg.visible & person_valid[..., None]

        return PipelineOutputs(
            boxes_norm=boxes_norm,
            boxes_orig=boxes_orig,
            person_valid=person_valid,
            det_scores=det_scores,
            keypoints=kp_img,
            kp_scores=kp_scores,
            kp_visible=kp_visible,
            lengths_cm=jnp.where(seg_visible, seg.lengths_cm, 0.0),
            seg_visible=seg_visible,
            heatmaps=heatmaps if with_heatmaps else None,
        )

    def jit_forward(self, with_heatmaps: bool = False, **jit_kwargs):
        """jit-compiled forward; batch size picks the compiled variant."""
        return jax.jit(
            functools.partial(self.forward, with_heatmaps=with_heatmaps),
            **jit_kwargs,
        )

    def forward_serving(self, det_vars, pose_vars, images, det_threshold,
                        person_heights, orig_hw) -> jax.Array:
        """Serving variant: everything the HTTP response needs packed into
        ONE [B, P, 23] f32 tensor (valid | 11 lengths | 11 visibility).

        Under the remote-TPU tunnel every device->host array fetch is a
        full round trip (~30 ms); the response only needs these 23 scalars
        per person slot, so packing turns per-request latency from O(leaves
        x batch) round trips into exactly one."""
        out = self.forward(
            det_vars, pose_vars, images, det_threshold, person_heights,
            orig_hw, with_heatmaps=False,
        )
        return jnp.concatenate(
            [
                out.person_valid.astype(jnp.float32)[..., None],
                out.lengths_cm,
                out.seg_visible.astype(jnp.float32),
            ],
            axis=-1,
        )

    def jit_forward_serving(self, **jit_kwargs):
        return jax.jit(self.forward_serving, **jit_kwargs)
