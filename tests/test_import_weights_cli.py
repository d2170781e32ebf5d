"""End-to-end weight-conversion CLI: synthetic upstream artifacts ->
orbax pipeline checkpoint -> values verifiably in the right slots."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from human_body_proportion_estimation_tpu.models import (  # noqa: E402
    tf_import as TI,
    weights as W,
)
from human_body_proportion_estimation_tpu.models.efficientdet import (  # noqa: E402
    EFFICIENTDET_LITE0,
    EfficientDet,
)


def _write_tf1_ckpt(arrays, path):
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        for name, val in arrays.items():
            tf1.get_variable(name, initializer=tf.constant(val))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, path)


def test_import_weights_cli_edet_and_hrnet(tmp_path):
    from human_body_proportion_estimation_tpu.cli import import_weights
    from human_body_proportion_estimation_tpu.models.hrnet import (
        HRNET_W32,
        create_hrnet,
    )

    # synthetic automl checkpoint for lite0 (full det input size)
    det_model = EfficientDet(config=EFFICIENTDET_LITE0, dtype=jnp.float32)
    det_template = det_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 480, 640, 3), jnp.float32)
    )
    arrays = TI.export_tf_efficientdet(det_template, EFFICIENTDET_LITE0)
    ckpt_prefix = _write_tf1_ckpt(arrays, str(tmp_path / "edet.ckpt"))

    # synthetic pose_hrnet state_dict from a seeded w32 init
    pose_model = create_hrnet("hrnet_w32")
    pose_template = pose_model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 384, 288, 3), jnp.float32)
    )
    sd = W.export_torch_hrnet(pose_template, HRNET_W32)
    pth = tmp_path / "pose_hrnet_w32.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))

    out_dir = tmp_path / "ckpt"
    import_weights.main([
        "--efficientdet-ckpt", ckpt_prefix,
        "--efficientdet-variant", "lite0",
        "--hrnet-torch", str(pth),
        "--out", str(out_dir),
    ])

    det_vars, pose_vars = W.load_pipeline_checkpoint(str(out_dir))
    # spot-check: the converted slots hold the source tensors exactly
    np.testing.assert_array_equal(
        det_vars["params"]["backbone"]["stem"]["conv"]["kernel"],
        arrays[f"{EFFICIENTDET_LITE0.backbone.tf_name}/stem/conv2d/kernel"],
    )
    np.testing.assert_array_equal(
        pose_vars["params"]["stem1"]["conv"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    # and the pipeline built from them reports real weights
    from human_body_proportion_estimation_tpu.pipeline.host import (
        InferencePipeline,
    )
    from human_body_proportion_estimation_tpu.utils.config import (
        PipelineConfig,
    )

    pipe = InferencePipeline(
        config=PipelineConfig(), det_config=EFFICIENTDET_LITE0,
        det_vars=det_vars, pose_vars=pose_vars,
    )
    assert pipe.weights_origin == {"detector": "real", "pose": "real"}
