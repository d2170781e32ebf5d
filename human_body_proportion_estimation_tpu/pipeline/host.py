"""Host-side orchestration around the fused device program.

Everything the host still does is cheap and latency-insensitive: bytes ->
RGB decode, cv2 resize to the detector input size, batch padding, and
shaping device outputs into the reference's response structures. All
numerics live in the fused XLA program (`pipeline/full.py`).

Response-structure parity: `format_image_result` mirrors the nested return
value of reference `run_pdet_pose`
(`person_det_pose_edet4_trtserver.py:131-171`): per image
``[boxes, heatmaps, dist_dict_person0, dist_dict_person1, ...]`` with boxes
de-normalized y1x1y2x2 in original-image space, and the HTTP layer's
first-person-only / "No humans detected" behavior built on top
(`uvicorn_server/server.py:61-67`).

Color handling: file paths decode BGR (cv2) and are flipped to RGB; raw
bytes decode RGB (PIL) and are fed as RGB. The reference applies an
unconditional BGR2RGB to both, which silently feeds BGR to the detector on
the served-bytes path (`triton_utils.py:87` + driver preprocess) — a color
bug this implementation fixes rather than replicates.
"""

from __future__ import annotations

import io
from typing import Any, Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from human_body_proportion_estimation_tpu.models.efficientdet import (
    EFFICIENTDET_LITE0,
    EFFICIENTDET_LITE4,
    EfficientDet,
    EfficientDetConfig,
)
from human_body_proportion_estimation_tpu.models.hrnet import create_hrnet
from human_body_proportion_estimation_tpu.ops import proportions as prop_ops
from human_body_proportion_estimation_tpu.pipeline.full import (
    FusedPipeline,
    PipelineOutputs,
)
from human_body_proportion_estimation_tpu.utils.config import PipelineConfig


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Raw encoded bytes -> RGB uint8 HWC (PIL, like triton_utils.py:87)."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img)


def load_image_path(path: str) -> np.ndarray:
    """Image file -> RGB uint8 HWC (cv2 BGR decode + flip)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise ValueError(f"could not decode image: {path}")
    return img[..., ::-1].copy()


def resize_for_detector(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Host resize to the det input size (cv2 bilinear, reference
    `person_det_pose_edet4_trtserver.py:15-18`)."""
    import cv2

    return cv2.resize(img, (width, height)).astype(np.uint8)


def _pad_batch(n: int, max_batch: int) -> int:
    """Round up to the next power-of-two bucket (bounds compile count)."""
    b = 1
    while b < n:
        b *= 2
    return min(max(b, 1), max(max_batch, n))


def prepare_batch(cfg, images_rgb, person_heights, det_threshold, b: int):
    """Host-side batch assembly to a FIXED batch size `b`.

    Resizes each image to the detector input, records its original (h, w),
    and broadcasts per-request heights/thresholds into padded arrays.
    `person_heights`: scalar (all images), or per-image scalars/lists
    (`FLAGS.p_height[min(i, len-1)]` semantics, reference driver :167).
    Returns (batch u8 [b,H,W,3], thresholds f32 [b], heights f32 [b,P],
    orig_hw f32 [b,2], n).
    """
    n = len(images_rgb)
    if n > b:
        raise ValueError(f"{n} images exceed fixed batch size {b}")
    p = cfg.detector.max_persons
    h, w = cfg.detector.input_height, cfg.detector.input_width

    batch = np.zeros((b, h, w, 3), np.uint8)
    orig_hw = np.ones((b, 2), np.float32)
    heights = np.full((b, p), 175.0, np.float32)
    thresholds = np.full(
        (b,),
        det_threshold if np.isscalar(det_threshold) else 1.0,
        np.float32,
    )
    for i, img in enumerate(images_rgb):
        if not np.isscalar(det_threshold):
            thresholds[i] = float(det_threshold[i])
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
    return batch, thresholds, heights, orig_hw, n


def prewarm_serving(pipeline) -> list:
    """Compile + run the serving program for every batch bucket up front.

    Triton marks a model READY only after load + initialize — the
    reference's README tells users to wait for the server to report all
    models loaded before the smoke test (README.md:56-64). The analog for
    an XLA pipeline is paying each batch bucket's compile before the first
    real request: without this, the first request at a new bucket size
    stalls on XLA compilation. Dummy images flow through the full
    `infer_serving` path (host prepare, upload, program cache), so every
    power-of-two bucket up to `serve.max_batch` (or the artifact's single
    fixed batch) is hot afterwards. Works on any serving pipeline object
    (top-down, bottom-up, artifact-restored). Returns the image counts
    warmed and sets `pipeline.prewarmed` for /health.
    """
    art = getattr(pipeline, "artifact", None)
    max_batch = (art.effective_batch if art is not None
                 else pipeline.config.serve.max_batch)
    img = np.zeros((64, 48, 3), np.uint8)
    warmed = []
    n = 1
    while True:
        pipeline.infer_serving([img] * n, person_heights=175.0,
                               det_threshold=0.99)
        warmed.append(n)
        if n >= max_batch:
            break
        n = min(n * 2, max_batch)
    pipeline.prewarmed = True
    return warmed


class InferencePipeline:
    """Owns model params + jitted programs; the in-process "model server".

    The reference needs a Triton container + gRPC client for this role; here
    it is a plain object whose `infer_*` methods block until device results
    are ready. Thread-safe for concurrent callers (jax dispatch is).
    """

    def __init__(
        self,
        config: PipelineConfig | None = None,
        det_config: EfficientDetConfig | None = None,
        rng_seed: int = 0,
        det_vars: Any | None = None,
        pose_vars: Any | None = None,
        detector: str | None = None,
        mesh=None,
        backend=None,
        pose=None,
        place_params: bool = True,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the
        fused program is then jitted with the image batch sharded over
        'data' and params replicated, scaling serving throughput linearly
        over ICI (the reference is single-GPU only, SURVEY 2.3). Batch
        sizes must be multiples of the data-axis size."""
        from human_body_proportion_estimation_tpu.pipeline.backends import (
            EfficientDetBackend,
            SSDBackend,
            YoloBackend,
        )

        self.config = config or PipelineConfig()
        cfg = self.config
        detector = detector or cfg.detector.name
        if det_config is None:
            # resolve the EfficientDet architecture from the slot name so
            # name-only callers (cli/evaluate, cli/certify) can't pair a
            # lite0 checkpoint with the default lite4 graph
            det_config = (
                EFFICIENTDET_LITE0 if detector == "efficientdet_lite0"
                else EFFICIENTDET_LITE4
            )
        if backend is not None:
            # pre-built detector slot (tests, custom configurations)
            self.backend = backend
            det_weights_real = (
                isinstance(backend, SSDBackend) or det_vars is not None
            )
        elif detector == "ssd_mobilenet":
            # the slot with REAL weights (reference's checked-in ssd.tflite)
            self.backend = SSDBackend(cfg)
            det_weights_real = True
        elif detector.startswith("yolov5"):
            self.backend = YoloBackend(cfg, variant=detector)
            det_weights_real = det_vars is not None
        else:
            # TPU serving gets the fused Pallas head-score kernel; under a
            # mesh it runs per-'data'-shard via shard_map (pallas_call has
            # no SPMD partitioning rule of its own — same treatment as the
            # Pallas heatmap decode in pipeline/full.py)
            use_score_kernel = jax.local_devices()[0].platform == "tpu"
            self.backend = EfficientDetBackend(
                EfficientDet(
                    config=det_config,
                    score_kernel=use_score_kernel,
                    person_class0=cfg.detector.person_class_id - 1,
                    score_kernel_mesh=mesh if use_score_kernel else None,
                ),
                cfg,
            )
            det_weights_real = det_vars is not None
        # the reference always serves pretrained weights (README.md:13-26
        # download step is mandatory); a slot running random init must be
        # loud about it — confident-looking cm values from random weights
        # are a false parity (/health reports this per model)
        self.weights_origin = {
            "detector": "real" if det_weights_real else "random",
            "pose": "real" if pose_vars is not None else "random",
        }
        if "random" in self.weights_origin.values():
            from human_body_proportion_estimation_tpu.utils.logging import (
                get_logger,
            )

            get_logger("pipeline").warning(
                "random_weights",
                msg="RANDOM-INIT WEIGHTS IN USE — outputs are garbage; "
                    "pass det_vars/pose_vars (weights.load_pipeline_"
                    "checkpoint) or detector='ssd_mobilenet'",
                **self.weights_origin,
            )
        if pose is not None:
            # pre-built pose model (tests, reduced-shape certification
            # pipelines); mirrors the `backend` escape hatch above
            self.pose = pose
        elif cfg.pose.name == "higherhrnet":
            from human_body_proportion_estimation_tpu.models.higherhrnet import (
                HigherHRNetHeatmaps,
            )

            self.pose = HigherHRNetHeatmaps()
        else:
            self.pose = create_hrnet(cfg.pose.name)
        self.fused = FusedPipeline(
            cfg, self.backend, self.pose, sharded=mesh is not None,
            mesh=mesh,
        )

        if det_vars is None or pose_vars is None:
            # random init on host CPU (fast trace), then device-put once;
            # real checkpoints come through `weights.load_*`
            # local_devices: under multi-controller jax.devices() is the
            # GLOBAL list and [0] may belong to another process
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                rng = jax.random.PRNGKey(rng_seed)
                if det_vars is None:
                    det_vars = self.backend.init_vars(rng)
                if pose_vars is None:
                    pose_vars = self.pose.init(
                        rng,
                        jnp.zeros(
                            (1, cfg.pose.crop_height, cfg.pose.crop_width, 3),
                            jnp.float32,
                        ),
                    )
        # optional StageTimer (utils/profiling.py) the serving edge attaches
        # so /metrics can expose a per-stage latency split (host prepare vs
        # device upload vs compute+readback) — the observability the
        # round-1 review asked for to prove where serving time goes
        self.stages = None
        self.mesh = mesh
        if not place_params:
            # multi-controller (multi-host) mode: jax.devices()[0] may not
            # be addressable from this process, so params stay host-side;
            # parallel/multihost.MultiHostServing replicates them over the
            # global mesh and owns program placement
            self.det_vars = det_vars
            self.pose_vars = pose_vars
            self._data_sharding = None
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self.det_vars = jax.device_put(det_vars, replicated)
            self.pose_vars = jax.device_put(pose_vars, replicated)
            self._data_sharding = NamedSharding(mesh, P("data"))
        else:
            device = jax.devices()[0]
            self.det_vars = jax.device_put(det_vars, device)
            self.pose_vars = jax.device_put(pose_vars, device)
            self._data_sharding = None
        self._programs: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ #

    def _jit_kwargs(self):
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        ds = self._data_sharding
        # (det_vars, pose_vars, images, thresholds, heights, orig_hw)
        return {
            "in_shardings": (
                jax.tree.map(lambda _: rep, self.det_vars),
                jax.tree.map(lambda _: rep, self.pose_vars),
                NamedSharding(self.mesh, P("data", None, None, None)),
                ds,
                NamedSharding(self.mesh, P("data", None)),
                NamedSharding(self.mesh, P("data", None)),
            ),
        }

    def _program(self, with_heatmaps: bool):
        if with_heatmaps not in self._programs:
            self._programs[with_heatmaps] = self.fused.jit_forward(
                with_heatmaps=with_heatmaps, **self._jit_kwargs()
            )
        return self._programs[with_heatmaps]

    def _serving_program(self):
        if "serving" not in self._programs:
            self._programs["serving"] = self.fused.jit_forward_serving(
                **self._jit_kwargs()
            )
        return self._programs["serving"]

    def infer_serving(
        self,
        images_rgb: Sequence[np.ndarray],
        person_heights: Sequence[float] | float = 175.0,
        det_threshold: Sequence[float] | float = 0.70,
    ) -> np.ndarray:
        """Lean serving path: one packed [n, P, 23] numpy array
        (valid | lengths_cm x11 | seg_visible x11) in a single device
        readback — see FusedPipeline.forward_serving."""
        import contextlib

        stage = self.stages.stage if self.stages is not None else (
            lambda _name: contextlib.nullcontext()
        )
        with stage("host_prepare"):
            batch, thresholds, heights, orig_hw, n = self._prepare(
                images_rgb, person_heights, det_threshold
            )
        with stage("device_upload"):
            # NOTE: under the remote-TPU tunnel this measures transfer
            # DISPATCH acknowledgement; on locally attached TPUs it is the
            # actual copy (jax blocks the producer thread on the transfer)
            dev_batch = jnp.asarray(batch)
            dev_args = (
                jnp.asarray(thresholds), jnp.asarray(heights),
                jnp.asarray(orig_hw),
            )
            jax.block_until_ready(dev_batch)
        with stage("device_compute_readback"):
            # np.asarray is the only honest fence through the tunnel: it
            # completes when result VALUES are host-resident
            packed = np.asarray(self._serving_program()(
                self.det_vars, self.pose_vars, dev_batch, *dev_args
            ))
        return packed[:n]

    def infer_images(
        self,
        images_rgb: Sequence[np.ndarray],
        person_heights: Sequence[float] | float = 175.0,
        det_threshold: Sequence[float] | float = 0.70,
        with_heatmaps: bool = False,
    ) -> PipelineOutputs:
        """Run the fused program on a list of original-size RGB images.

        `person_heights`: one height per image (serving semantics), or a
        list-per-image of per-person heights (CLI semantics,
        `FLAGS.p_height[min(i, len-1)]`, driver :167).
        """
        batch, thresholds, heights, orig_hw, n = self._prepare(
            images_rgb, person_heights, det_threshold
        )
        out = self._program(with_heatmaps)(
            self.det_vars,
            self.pose_vars,
            jnp.asarray(batch),
            jnp.asarray(thresholds),
            jnp.asarray(heights),
            jnp.asarray(orig_hw),
        )
        # one bulk device->host fetch per leaf: downstream formatting slices
        # per image/slot, and under the remote-TPU link every lazy slice
        # fetch would be a full round trip
        out = jax.device_get(out)
        return jax.tree.map(lambda x: x[:n] if x is not None else None, out)

    def _prepare(self, images_rgb, person_heights, det_threshold):
        cfg = self.config
        n = len(images_rgb)
        b = _pad_batch(n, cfg.serve.max_batch)
        if self.mesh is not None:
            dp = self.mesh.shape["data"]
            b = max(b, dp)
            b = -(-b // dp) * dp  # round up to a data-shard multiple
        return prepare_batch(cfg, images_rgb, person_heights, det_threshold, b)

    # ------------------------------------------------------------------ #

    def infer_bytes(
        self,
        image_bytes: bytes,
        person_height_cm: float = 175.0,
        det_threshold: float = 0.70,
    ) -> Dict[str, Any]:
        """bytes -> HTTP-layer response dict (reference server.py:46-67)."""
        try:
            img = decode_image_bytes(image_bytes)
        except Exception:
            return {
                "code": "failed",
                "msg": "Failed to run inference on image. Please use an "
                       "image with one fully visible human.",
            }
        out = self.infer_images(
            [img], person_heights=float(person_height_cm),
            det_threshold=det_threshold,
        )
        dicts = format_image_result(out, 0)[2:]
        if not dicts:
            return {
                "code": "success",
                "msg": "No humans detected",
                "body_proportion_lengths_(cm)": {},
            }
        return {
            "code": "success",
            "msg": "human body proportion estimation complete",
            "body_proportion_lengths_(cm)": dicts[0],
        }


def format_image_result(out: PipelineOutputs, i: int) -> List[Any]:
    """Device outputs for image i -> reference-parity nested list
    ``[boxes, heatmaps, dist_dict_0, ...]`` (driver :131-171)."""
    valid = np.asarray(out.person_valid[i])
    nper = int(valid.sum())
    # boxes de-normalized to original-image pixels, y1x1y2x2 — the state the
    # reference leaves them in after its in-place `boxes *= [h, w, h, w]`
    # (driver :145)
    boxes = np.asarray(out.boxes_orig[i])[:nper]
    if out.heatmaps is not None:
        heatmaps = np.asarray(out.heatmaps[i])[:nper]
    else:
        heatmaps = np.zeros((nper, 0, 0, 0), np.float32)
    result: List[Any] = [boxes, heatmaps]
    lengths = np.asarray(out.lengths_cm[i])
    vis = np.asarray(out.seg_visible[i])
    for slot in range(nper):
        result.append(prop_ops.to_dist_dict(lengths[slot], vis[slot]))
    return result
