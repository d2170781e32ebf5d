"""Training data pipeline: COCO parsing, affine/flip correctness, and a
short real training run that overfits a tiny synthetic dataset."""

import json

import numpy as np
import pytest

from human_body_proportion_estimation_tpu.training import data as D


def _sample(rng, h=200, w=160):
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    kp = rng.uniform([20, 20], [w - 20, h - 20], (17, 2)).astype(np.float32)
    return D.PoseSample(
        image=img,
        keypoints=kp,
        visible=np.ones(17, bool),
        bbox_xywh=np.asarray([10, 10, w - 20, h - 20], np.float32),
    )


def test_load_coco_keypoints(tmp_path, rng):
    ann = {
        "images": [{"id": 7, "file_name": "a.jpg"}],
        "annotations": [
            {"image_id": 7, "num_keypoints": 17, "bbox": [1, 2, 30, 40],
             "keypoints": list(np.arange(51, dtype=float))},
            {"image_id": 7, "num_keypoints": 0, "bbox": [0, 0, 5, 5],
             "keypoints": [0.0] * 51},  # skipped
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    out = D.load_coco_keypoints(str(p), "/imgs")
    assert len(out) == 1
    assert out[0]["path"] == "/imgs/a.jpg"
    assert out[0]["keypoints"].shape == (17, 2)
    assert out[0]["visible"].dtype == bool


def test_crop_keypoints_ride_the_pixels(rng):
    # a keypoint placed on a distinctive pixel must land on that pixel in
    # the crop (affine consistency between image and labels)
    s = _sample(rng)
    marker = (80, 100)  # (x, y)
    s.image[marker[1], marker[0]] = [255, 0, 0]
    s.keypoints[0] = marker
    crop, kp, vis = D.crop_sample(s, 96, 128, rotation_deg=15.0)
    x, y = int(round(kp[0, 0])), int(round(kp[0, 1]))
    assert vis[0]
    patch = crop[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2]
    assert patch[..., 0].max() > 0.8  # the red marker is under the keypoint


def test_flip_swaps_left_right(rng):
    s = _sample(rng)
    _, kp_n, vis_n = D.crop_sample(s, 96, 128, flip=False)
    _, kp_f, vis_f = D.crop_sample(s, 96, 128, flip=True)
    # rshoulder (5) after flip mirrors lshoulder (6) before
    np.testing.assert_allclose(kp_f[5, 0], 96 - 1 - kp_n[6, 0], atol=1e-3)
    np.testing.assert_allclose(kp_f[5, 1], kp_n[6, 1], atol=1e-3)


def test_out_of_crop_marked_invisible(rng):
    s = _sample(rng)
    s.keypoints[3] = [-500.0, -500.0]
    _, _, vis = D.crop_sample(s, 96, 128)
    assert not vis[3]


def test_batch_iterator_shapes(rng):
    samples = [_sample(rng) for _ in range(5)]
    it = D.batch_iterator(samples, 2, crop_hw=(64, 48), augment=True)
    imgs, kps, vis = next(it)
    assert imgs.shape == (2, 64, 48, 3) and imgs.dtype == np.float32
    assert imgs.max() <= 1.0
    assert kps.shape == (2, 17, 2) and vis.shape == (2, 17)
    # heatmap coords are crop coords / 4
    assert kps.max() < 64 / 4 + 1


def test_training_loop_overfits_tiny_set(rng, tmp_path):
    import jax.numpy as jnp

    from human_body_proportion_estimation_tpu.models.hrnet import HRNet
    from human_body_proportion_estimation_tpu.training.loop import train_pose

    samples = [_sample(rng, 96, 64) for _ in range(4)]
    # depth-reduced W32: the overfit loop certifies data plumbing +
    # checkpointing + descent, not model scale (chip run: cli/certify.py)
    from tests.tiny_models import tiny_w32_config

    model = HRNet(config=tiny_w32_config(), dtype=jnp.float32)
    state, losses = train_pose(
        model, samples, steps=6, batch_size=2, crop_hw=(64, 32),
        learning_rate=1e-3, checkpoint_dir=str(tmp_path / "ck"),
        checkpoint_every=6, log_every=3, augment=False,
    )
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])  # descending
    assert (tmp_path / "ck" / "step_6").exists()
