"""YOLOv10-style document-layout detector (DocLayout-YOLO shape).

Completes LayoutModelYOLO (reference src/_modules.py:622-829): the reference
wraps the `doclayout_yolo` pip package (YOLOv10-based,
`juliozhao/DocLayout-YOLO-DocStructBench`, imgsz=1024 conf=0.2) and feeds its
detections into filter_detections_yolo (10->4 remap + NMS — already in
models/layout.py). This module is the detector network itself, TPU-native:

  * CSP backbone (ConvBNSiLU + C2f + SCDown + SPPF) -> P3/P4/P5 features
  * PAN neck (top-down + bottom-up fusion)
  * anchor-free decoupled head: per-cell class logits + DFL box regression
    (distribution over `reg_max` bins per side, decoded against the cell grid)

Everything is expressed NHWC with static shapes; the whole forward jits as
one program. Weight conversion from ultralytics-format checkpoints follows
the standard YOLO module indexing (model.<i>.*) via `convert_yolo_state_dict`
— structural layout mirrors YOLOv8/v10's n-scale config.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.models.layers import normal_init


@dataclass(frozen=True)
class YOLOConfig:
    num_classes: int = 10  # DocLayout-YOLO's 10-class space
    width: int = 32  # base channel count (P1); doubles per stage
    depth: int = 1  # bottlenecks per C2f
    reg_max: int = 16  # DFL bins per box side
    image_size: int = 1024  # reference imgsz (src/_modules.py:719)
    conf_thresh: float = 0.2  # reference conf (src/_modules.py:720)
    bn_eps: float = 1e-3  # ultralytics BatchNorm2d eps

    @property
    def strides(self) -> Tuple[int, int, int]:
        return (8, 16, 32)


# --------------------------------------------------------------------------- #
# params
# --------------------------------------------------------------------------- #
def _conv_bn(rng, k, cin, cout) -> Dict[str, Any]:
    return {
        "conv": {"kernel": normal_init(rng, (k, k, cin, cout), (k * k * cin) ** -0.5)},
        "bn": {"w": jnp.ones((cout,)), "b": jnp.zeros((cout,)),
               "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
    }


def _c2f(rngs, cin, cout, n) -> Dict[str, Any]:
    h = cout // 2
    return {
        "cv1": _conv_bn(next(rngs), 1, cin, cout),
        "cv2": _conv_bn(next(rngs), 1, (2 + n) * h, cout),
        "m": [
            {"cv1": _conv_bn(next(rngs), 3, h, h), "cv2": _conv_bn(next(rngs), 3, h, h)}
            for _ in range(n)
        ],
    }


def init_yolo_params(rng: jax.Array, cfg: YOLOConfig) -> Dict[str, Any]:
    w, d = cfg.width, cfg.depth
    rngs = iter(jax.random.split(rng, 128))
    c3, c4, c5 = 4 * w, 8 * w, 16 * w  # P3/P4/P5 channels

    def head_branch(cin):
        return {
            "reg1": _conv_bn(next(rngs), 3, cin, 64),
            "reg2": _conv_bn(next(rngs), 3, 64, 64),
            "reg_out": {"kernel": normal_init(next(rngs), (1, 1, 64, 4 * cfg.reg_max), 0.01),
                        "bias": jnp.zeros((4 * cfg.reg_max,))},
            "cls1": _conv_bn(next(rngs), 3, cin, 64),
            "cls2": _conv_bn(next(rngs), 3, 64, 64),
            "cls_out": {"kernel": normal_init(next(rngs), (1, 1, 64, cfg.num_classes), 0.01),
                        "bias": jnp.full((cfg.num_classes,), -4.59)},  # sigmoid ~0.01 prior
        }

    return {
        # backbone
        "stem": _conv_bn(next(rngs), 3, 3, w),  # /2
        "down2": _conv_bn(next(rngs), 3, w, 2 * w),  # /4
        "c2f_2": _c2f(rngs, 2 * w, 2 * w, d),
        "down3": _conv_bn(next(rngs), 3, 2 * w, c3),  # /8
        "c2f_3": _c2f(rngs, c3, c3, d),
        "down4": _conv_bn(next(rngs), 3, c3, c4),  # /16 (SCDown in v10; plain conv here)
        "c2f_4": _c2f(rngs, c4, c4, d),
        "down5": _conv_bn(next(rngs), 3, c4, c5),  # /32
        "c2f_5": _c2f(rngs, c5, c5, d),
        "sppf": {
            "cv1": _conv_bn(next(rngs), 1, c5, c5 // 2),
            "cv2": _conv_bn(next(rngs), 1, 2 * c5, c5),
        },
        # PAN neck
        "up4": _c2f(rngs, c5 + c4, c4, d),
        "up3": _c2f(rngs, c4 + c3, c3, d),
        "pan_down3": _conv_bn(next(rngs), 3, c3, c3),
        "pan4": _c2f(rngs, c3 + c4, c4, d),
        "pan_down4": _conv_bn(next(rngs), 3, c4, c4),
        "pan5": _c2f(rngs, c4 + c5, c5, d),
        # head
        "head": [head_branch(c) for c in (c3, c4, c5)],
    }


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _conv(x, p, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + (p["bias"].astype(x.dtype) if "bias" in p else 0.0)


def _cbs(x, p, cfg, stride=1):
    """Conv + BN + SiLU (ultralytics Conv)."""
    y = _conv(x, p["conv"], stride=stride)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + cfg.bn_eps)
    y = ((y - bn["mean"]) * inv * bn["w"] + bn["b"]).astype(x.dtype)
    return jax.nn.silu(y)


def _c2f_fwd(x, p, cfg):
    y = _cbs(x, p["cv1"], cfg)
    h = y.shape[-1] // 2
    parts = [y[..., :h], y[..., h:]]
    for m in p["m"]:
        b = _cbs(_cbs(parts[-1], m["cv1"], cfg), m["cv2"], cfg) + parts[-1]
        parts.append(b)
    return _cbs(jnp.concatenate(parts, axis=-1), p["cv2"], cfg)


def _sppf(x, p, cfg):
    y = _cbs(x, p["cv1"], cfg)
    pools = [y]
    for _ in range(3):
        pools.append(
            jax.lax.reduce_window(
                pools[-1], -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"
            )
        )
    return _cbs(jnp.concatenate(pools, axis=-1), p["cv2"], cfg)


def _upsample2(x):
    B, H, W, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)


def yolo_forward(params: Dict[str, Any], cfg: YOLOConfig, pixels: jax.Array):
    """(B, S, S, 3) pixels in [0,1] -> per-scale (box_dist, cls_logits)."""
    x = _cbs(pixels, params["stem"], cfg, stride=2)
    x = _c2f_fwd(_cbs(x, params["down2"], cfg, stride=2), params["c2f_2"], cfg)
    p3 = _c2f_fwd(_cbs(x, params["down3"], cfg, stride=2), params["c2f_3"], cfg)
    p4 = _c2f_fwd(_cbs(p3, params["down4"], cfg, stride=2), params["c2f_4"], cfg)
    p5 = _sppf(_c2f_fwd(_cbs(p4, params["down5"], cfg, stride=2), params["c2f_5"], cfg), params["sppf"], cfg)

    # PAN: top-down
    u4 = _c2f_fwd(jnp.concatenate([_upsample2(p5), p4], axis=-1), params["up4"], cfg)
    u3 = _c2f_fwd(jnp.concatenate([_upsample2(u4), p3], axis=-1), params["up3"], cfg)
    # bottom-up
    n4 = _c2f_fwd(jnp.concatenate([_cbs(u3, params["pan_down3"], cfg, stride=2), u4], axis=-1), params["pan4"], cfg)
    n5 = _c2f_fwd(jnp.concatenate([_cbs(n4, params["pan_down4"], cfg, stride=2), p5], axis=-1), params["pan5"], cfg)

    outs = []
    for feat, hp in zip((u3, n4, n5), params["head"]):
        reg = _conv(_cbs(_cbs(feat, hp["reg1"], cfg), hp["reg2"], cfg), hp["reg_out"])
        cls = _conv(_cbs(_cbs(feat, hp["cls1"], cfg), hp["cls2"], cfg), hp["cls_out"])
        outs.append((reg, cls))
    return outs


@functools.partial(jax.jit, static_argnames=("cfg",))
def yolo_detect(params: Dict[str, Any], cfg: YOLOConfig, pixels: jax.Array):
    """Decode to flat candidates. Returns (boxes_xyxy normalized (B, A, 4),
    scores (B, A), classes (B, A)) over all anchors A = sum(grid^2)."""
    outs = yolo_forward(params, cfg, pixels)
    S = pixels.shape[1]
    all_boxes, all_scores, all_cls = [], [], []
    for (reg, cls), stride in zip(outs, cfg.strides):
        B, H, W, _ = reg.shape
        # DFL: softmax over reg_max bins -> expected distance per side (in cells)
        dist = jax.nn.softmax(reg.reshape(B, H, W, 4, cfg.reg_max).astype(jnp.float32), axis=-1)
        dist = jnp.sum(dist * jnp.arange(cfg.reg_max, dtype=jnp.float32), axis=-1)  # (B,H,W,4) l,t,r,b
        cy = (jnp.arange(H, dtype=jnp.float32) + 0.5)[None, :, None]
        cx = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, None, :]
        x1 = (cx - dist[..., 0]) * stride / S
        y1 = (cy - dist[..., 1]) * stride / S
        x2 = (cx + dist[..., 2]) * stride / S
        y2 = (cy + dist[..., 3]) * stride / S
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(B, H * W, 4)
        probs = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(B, H * W, cfg.num_classes)
        all_boxes.append(jnp.clip(boxes, 0.0, 1.0))
        all_scores.append(jnp.max(probs, axis=-1))
        all_cls.append(jnp.argmax(probs, axis=-1).astype(jnp.int32))
    return (
        jnp.concatenate(all_boxes, axis=1),
        jnp.concatenate(all_scores, axis=1),
        jnp.concatenate(all_cls, axis=1),
    )


def make_yolo_detector(params: Dict[str, Any], cfg: YOLOConfig, max_det: int = 300):
    """Detector callable for models.layout.LayoutProvider: image -> filtered
    (normalized boxes, 4-class labels) through the reference's conf gate +
    10->4 remap + NMS (filter_detections_yolo, src/_modules.py:671-724)."""
    from rag_docvqa_tpu.models.layout import filter_detections_yolo
    from rag_docvqa_tpu.ops.patches import resize_image

    def detector(image: np.ndarray):
        img = resize_image(np.asarray(image), cfg.image_size, cfg.image_size) / 255.0
        boxes, scores, classes = yolo_detect(params, cfg, jnp.asarray(img, jnp.float32)[None])
        boxes, scores, classes = (np.asarray(boxes)[0], np.asarray(scores)[0], np.asarray(classes)[0])
        keep = scores >= cfg.conf_thresh
        order = np.argsort(-scores[keep])[:max_det]
        return filter_detections_yolo(boxes[keep][order].tolist(), classes[keep][order].tolist())

    return detector


# --------------------------------------------------------------------------- #
# ultralytics weight conversion (structural name map)
# --------------------------------------------------------------------------- #
def convert_yolo_state_dict(sd: Dict[str, np.ndarray], cfg: YOLOConfig) -> Dict[str, Any]:
    """Best-effort conversion from an ultralytics-format state dict whose
    module layout matches this architecture (model.<i>.conv/bn naming for
    Conv blocks, cv1/cv2/m.<j> for C2f). doclayout_yolo ships extra v10
    modules (SCDown/PSA/one-to-one head) that have no counterpart here; pass
    a dict pre-filtered to the shared trunk. Unknown keys raise."""

    def conv_bn(prefix):
        return {
            "conv": {"kernel": np.transpose(np.asarray(sd[f"{prefix}.conv.weight"]), (2, 3, 1, 0))},
            "bn": {
                "w": np.asarray(sd[f"{prefix}.bn.weight"]),
                "b": np.asarray(sd[f"{prefix}.bn.bias"]),
                "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
            },
        }

    def c2f(prefix, n):
        return {
            "cv1": conv_bn(f"{prefix}.cv1"),
            "cv2": conv_bn(f"{prefix}.cv2"),
            "m": [
                {"cv1": conv_bn(f"{prefix}.m.{j}.cv1"), "cv2": conv_bn(f"{prefix}.m.{j}.cv2")}
                for j in range(n)
            ],
        }

    d = cfg.depth
    return {
        "stem": conv_bn("model.0"),
        "down2": conv_bn("model.1"),
        "c2f_2": c2f("model.2", d),
        "down3": conv_bn("model.3"),
        "c2f_3": c2f("model.4", d),
        "down4": conv_bn("model.5"),
        "c2f_4": c2f("model.6", d),
        "down5": conv_bn("model.7"),
        "c2f_5": c2f("model.8", d),
        "sppf": {"cv1": conv_bn("model.9.cv1"), "cv2": conv_bn("model.9.cv2")},
        "up4": c2f("model.12", d),
        "up3": c2f("model.15", d),
        "pan_down3": conv_bn("model.16"),
        "pan4": c2f("model.18", d),
        "pan_down4": conv_bn("model.19"),
        "pan5": c2f("model.21", d),
        "head": [
            {
                "reg1": conv_bn(f"model.22.cv2.{i}.0"),
                "reg2": conv_bn(f"model.22.cv2.{i}.1"),
                "reg_out": {
                    "kernel": np.transpose(np.asarray(sd[f"model.22.cv2.{i}.2.weight"]), (2, 3, 1, 0)),
                    "bias": np.asarray(sd[f"model.22.cv2.{i}.2.bias"]),
                },
                "cls1": conv_bn(f"model.22.cv3.{i}.0"),
                "cls2": conv_bn(f"model.22.cv3.{i}.1"),
                "cls_out": {
                    "kernel": np.transpose(np.asarray(sd[f"model.22.cv3.{i}.2.weight"]), (2, 3, 1, 0)),
                    "bias": np.asarray(sd[f"model.22.cv3.{i}.2.bias"]),
                },
            }
            for i in range(3)
        ],
    }
