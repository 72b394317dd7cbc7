"""YOLOv10-style layout detector: shapes, DFL decode math, detector plumbing.

Completes component #8 (LayoutModelYOLO, SURVEY §2.1): the network behind the
existing filter_detections_yolo post-processing (src/_modules.py:622-829).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.yolo import (
    YOLOConfig,
    init_yolo_params,
    make_yolo_detector,
    yolo_detect,
    yolo_forward,
)

CFG = YOLOConfig(num_classes=10, width=8, depth=1, reg_max=4, image_size=128, conf_thresh=0.2)


@pytest.mark.slow
def test_forward_shapes():
    params = init_yolo_params(jax.random.PRNGKey(0), CFG)
    pix = jnp.asarray(np.random.RandomState(0).rand(2, 128, 128, 3), jnp.float32)
    outs = yolo_forward(params, CFG, pix)
    assert len(outs) == 3
    for (reg, cls), stride in zip(outs, CFG.strides):
        g = 128 // stride
        assert reg.shape == (2, g, g, 4 * CFG.reg_max)
        assert cls.shape == (2, g, g, CFG.num_classes)


def test_detect_decode_boxes_normalized():
    params = init_yolo_params(jax.random.PRNGKey(1), CFG)
    pix = jnp.asarray(np.random.RandomState(1).rand(1, 128, 128, 3), jnp.float32)
    boxes, scores, classes = yolo_detect(params, CFG, pix)
    A = sum((128 // s) ** 2 for s in CFG.strides)
    assert boxes.shape == (1, A, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    s = np.asarray(scores)
    assert (s >= 0).all() and (s <= 1).all()
    assert (np.asarray(classes) < CFG.num_classes).all()


def test_dfl_decode_math():
    """A hand-set regression distribution decodes to the expected box:
    bin-expectation distances (l,t,r,b) in cells around each cell center."""
    from rag_docvqa_tpu.models.yolo import _cbs  # noqa: F401  (import check)

    cfg = YOLOConfig(num_classes=2, width=8, depth=1, reg_max=4, image_size=64)
    params = init_yolo_params(jax.random.PRNGKey(2), cfg)

    # force the P3 head to emit delta distributions peaked at bin 2 for every
    # side -> distance 2 cells each side
    hp = params["head"][0]
    big = 50.0
    kernel = np.zeros(np.asarray(hp["reg_out"]["kernel"]).shape, np.float32)
    bias = np.full((4 * cfg.reg_max,), -big, np.float32)
    bias[2::cfg.reg_max] = big  # bin index 2 for each of the 4 sides
    params["head"][0] = {**hp, "reg_out": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}

    pix = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, _, _ = yolo_detect(params, cfg, pix)
    boxes = np.asarray(boxes)[0]
    # first anchor = P3 cell (0, 0): center (0.5, 0.5) cells, stride 8, S=64
    s = 8 / 64
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 2.5 * s, 2.5 * s], atol=1e-5)
    # an interior P3 cell: row 3, col 4 -> index 3*8+4
    i = 3 * 8 + 4
    np.testing.assert_allclose(
        boxes[i], [(4.5 - 2) * s, (3.5 - 2) * s, (4.5 + 2) * s, (3.5 + 2) * s], atol=1e-5
    )


def test_detector_plugs_into_layout_provider():
    from rag_docvqa_tpu.models.layout import LayoutProvider

    params = init_yolo_params(jax.random.PRNGKey(3), CFG)
    det = make_yolo_detector(params, CFG)
    img = (np.random.RandomState(4).rand(200, 160, 3) * 255).astype(np.uint8)
    boxes, labels = det(img)
    assert isinstance(boxes, list) and isinstance(labels, list)
    provider = LayoutProvider(detector=det)
    layout = provider.page_layout(image=img)
    assert set(layout) >= {"boxes", "labels"}


def test_ultralytics_conversion_structural():
    """A synthetic ultralytics-named state dict converts onto the tree and
    changes the forward output (i.e. every mapped tensor lands somewhere)."""
    from rag_docvqa_tpu.models.yolo import convert_yolo_state_dict

    cfg = YOLOConfig(num_classes=3, width=8, depth=1, reg_max=4, image_size=64)
    ref = init_yolo_params(jax.random.PRNGKey(5), cfg)

    rng = np.random.RandomState(0)
    sd = {}

    def put_conv(prefix, p):
        k = np.asarray(p["conv"]["kernel"])
        sd[f"{prefix}.conv.weight"] = rng.randn(*np.transpose(k, (3, 2, 0, 1)).shape).astype(np.float32)
        for name, arr in (("weight", "w"), ("bias", "b"), ("running_mean", "mean"), ("running_var", "var")):
            v = rng.rand(*np.asarray(p["bn"][arr]).shape).astype(np.float32) + 0.5
            sd[f"{prefix}.bn.{name}"] = v

    def put_c2f(prefix, p):
        put_conv(f"{prefix}.cv1", p["cv1"])
        put_conv(f"{prefix}.cv2", p["cv2"])
        for j, m in enumerate(p["m"]):
            put_conv(f"{prefix}.m.{j}.cv1", m["cv1"])
            put_conv(f"{prefix}.m.{j}.cv2", m["cv2"])

    layout = [("model.0", ref["stem"]), ("model.1", ref["down2"]), ("model.3", ref["down3"]),
              ("model.5", ref["down4"]), ("model.7", ref["down5"]),
              ("model.16", ref["pan_down3"]), ("model.19", ref["pan_down4"])]
    for prefix, p in layout:
        put_conv(prefix, p)
    for prefix, p in (("model.2", ref["c2f_2"]), ("model.4", ref["c2f_3"]), ("model.6", ref["c2f_4"]),
                      ("model.8", ref["c2f_5"]), ("model.12", ref["up4"]), ("model.15", ref["up3"]),
                      ("model.18", ref["pan4"]), ("model.21", ref["pan5"])):
        put_c2f(prefix, p)
    put_conv("model.9.cv1", ref["sppf"]["cv1"])
    put_conv("model.9.cv2", ref["sppf"]["cv2"])
    for i, hp in enumerate(ref["head"]):
        put_conv(f"model.22.cv2.{i}.0", hp["reg1"])
        put_conv(f"model.22.cv2.{i}.1", hp["reg2"])
        sd[f"model.22.cv2.{i}.2.weight"] = rng.randn(
            *np.transpose(np.asarray(hp["reg_out"]["kernel"]), (3, 2, 0, 1)).shape
        ).astype(np.float32)
        sd[f"model.22.cv2.{i}.2.bias"] = rng.randn(4 * cfg.reg_max).astype(np.float32)
        put_conv(f"model.22.cv3.{i}.0", hp["cls1"])
        put_conv(f"model.22.cv3.{i}.1", hp["cls2"])
        sd[f"model.22.cv3.{i}.2.weight"] = rng.randn(
            *np.transpose(np.asarray(hp["cls_out"]["kernel"]), (3, 2, 0, 1)).shape
        ).astype(np.float32)
        sd[f"model.22.cv3.{i}.2.bias"] = rng.randn(cfg.num_classes).astype(np.float32)

    converted = convert_yolo_state_dict(sd, cfg)
    # same tree structure, different leaf content
    ref_leaves = jax.tree.leaves(ref)
    conv_leaves = jax.tree.leaves(jax.tree.map(jnp.asarray, converted))
    assert len(ref_leaves) == len(conv_leaves)
    pix = jnp.asarray(np.random.RandomState(6).rand(1, 64, 64, 3), jnp.float32)
    out_ref = yolo_detect(ref, cfg, pix)[1]
    out_conv = yolo_detect(jax.tree.map(jnp.asarray, converted), cfg, pix)[1]
    assert not np.allclose(np.asarray(out_ref), np.asarray(out_conv))
