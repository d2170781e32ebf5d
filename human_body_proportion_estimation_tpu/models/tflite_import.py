"""Dequantize the reference's checked-in ssd.tflite into our Flax SSD.

The only pretrained weights the reference repo actually contains is the
4.2 MB quantized `modules/mnetv1_sdd_tflite/ssd.tflite`
(`modules/human_detector.py:10`). This importer reads that flatbuffer with
the TF Lite interpreter (used purely as a file parser — no tflite runtime
in the serving path), dequantizes every conv weight/bias
((uint8 - zero_point) * scale), and lays them into the
`SSDMobileNetV1` parameter tree, plus the 1917-anchor table the
TFLite_Detection_PostProcess op consumes.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

DEFAULT_TFLITE_PATH = (
    "/root/reference/human_body_length_est/modules/mnetv1_sdd_tflite/"
    "ssd.tflite"
)

_PREFIX = "FeatureExtractor/MobilenetV1/"
# our param name -> (weights tensor name, bias tensor name) in the blob
_EXTRA_IDS = (2, 3, 4, 5)


def _name_map() -> Dict[str, Tuple[str, str]]:
    m = {
        "conv0": (
            _PREFIX + "MobilenetV1/Conv2d_0/weights_quant/FakeQuantWithMinMaxVars",
            _PREFIX + "MobilenetV1/Conv2d_0/Conv2D_Fold_bias",
        ),
    }
    for i in range(1, 14):
        m[f"dw{i}"] = (
            _PREFIX + f"MobilenetV1/Conv2d_{i}_depthwise/weights_quant/"
                      "FakeQuantWithMinMaxVars",
            _PREFIX + f"MobilenetV1/Conv2d_{i}_depthwise/depthwise_Fold_bias",
        )
        m[f"pw{i}"] = (
            _PREFIX + f"MobilenetV1/Conv2d_{i}_pointwise/weights_quant/"
                      "FakeQuantWithMinMaxVars",
            _PREFIX + f"MobilenetV1/Conv2d_{i}_pointwise/Conv2D_Fold_bias",
        )
    # extra SSD layers: names carry their output channel count
    extra_ch = {2: (192, 384), 3: (96, 192), 4: (96, 192), 5: (48, 96)}
    for j in _EXTRA_IDS:
        c1, c3 = extra_ch[j]
        m[f"extra{j}_1x1"] = (
            _PREFIX + f"Conv2d_13_pointwise_1_Conv2d_{j}_1x1_{c1}/"
                      "weights_quant/FakeQuantWithMinMaxVars",
            _PREFIX + f"Conv2d_13_pointwise_1_Conv2d_{j}_1x1_{c1}/"
                      "Conv2D_Fold_bias",
        )
        m[f"extra{j}_3x3"] = (
            _PREFIX + f"Conv2d_13_pointwise_2_Conv2d_{j}_3x3_s2_{c3}/"
                      "weights_quant/FakeQuantWithMinMaxVars",
            _PREFIX + f"Conv2d_13_pointwise_2_Conv2d_{j}_3x3_s2_{c3}/"
                      "Conv2D_Fold_bias",
        )
    for li in range(6):
        m[f"box{li}"] = (
            f"BoxPredictor_{li}/BoxEncodingPredictor/weights_quant/"
            "FakeQuantWithMinMaxVars",
            f"BoxPredictor_{li}/BoxEncodingPredictor/Conv2D_bias",
        )
        m[f"cls{li}"] = (
            f"BoxPredictor_{li}/ClassPredictor/weights_quant/"
            "FakeQuantWithMinMaxVars",
            f"BoxPredictor_{li}/ClassPredictor/Conv2D_bias",
        )
    return m


def _dequant(tensor: np.ndarray, scale: float, zero_point: int) -> np.ndarray:
    if tensor.dtype in (np.uint8, np.int8, np.int32):
        return (tensor.astype(np.float32) - zero_point) * scale
    return tensor.astype(np.float32)


def _to_hwio(w: np.ndarray, depthwise: bool) -> np.ndarray:
    """tflite conv weights -> flax HWIO.

    tflite layout: conv [O, H, W, I]; depthwise [1, H, W, C] with
    feature_group_count=C in flax expecting HWIO = [H, W, 1, C].
    """
    if depthwise:
        return np.transpose(w, (1, 2, 0, 3))
    return np.transpose(w, (1, 2, 3, 0))


def load_ssd_weights(
    path: str = DEFAULT_TFLITE_PATH,
) -> Tuple[Dict[str, Any], np.ndarray]:
    """Returns ({'params': ...} for SSDMobileNetV1, anchors [1917, 4])."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    it = tf.lite.Interpreter(model_path=path)
    it.allocate_tensors()
    by_name = {}
    for d in it.get_tensor_details():
        by_name[d["name"]] = d

    def fetch(name: str) -> np.ndarray:
        d = by_name[name]
        scale, zp = d["quantization"]
        return _dequant(it.get_tensor(d["index"]), scale, int(zp))

    params: Dict[str, Any] = {}
    for our_name, (w_name, b_name) in _name_map().items():
        w = fetch(w_name)
        b = fetch(b_name)
        depthwise = our_name.startswith("dw")
        params[our_name] = {
            "conv": {
                "kernel": _to_hwio(w, depthwise),
                "bias": b,
            }
        }

    anchors = fetch("anchors")  # quantized like everything else
    return {"params": params}, anchors
