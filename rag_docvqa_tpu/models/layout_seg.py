"""BEiT semantic-segmentation head (HF BeitForSemanticSegmentation parity).

Completes LayoutModelDIT (reference src/_modules.py:293-619): the reference
runs `cmarkea/dit-base-layout-detection` — a BEiT backbone + UPerNet decode
head — to get an (H, W) class map, then post-processes it with
mask_to_boxes/filter_detections_dit (already in models/layout.py). This
module is the missing decode head:

  backbone taps (4 block outputs)          HF modeling_beit.py: features at
                                           config.out_indices (1-based)
  fpn1..fpn4 multi-scale adapters          ConvT(2,2)+BN+GELU+ConvT / ConvT /
                                           Identity / MaxPool(2)
  UPerHead: PSP pyramid pooling on the     BeitPyramidPoolingModule +
  top feature, lateral 1x1 convs,          BeitUperHead (OpenMMLab semantics)
  top-down FPN, fpn_bottleneck, 1x1
  classifier

TPU notes: convs run NHWC; the 2x2-stride-2 transposed convs are expressed as
one einsum + pixel-shuffle reshape (exact, MXU-friendly); BatchNorm is
inference-mode affine with running stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.models.layers import normal_init
from rag_docvqa_tpu.models.vit import ViTConfig, convert_vit_state_dict, init_vit_params, vit_encode


@dataclass(frozen=True)
class BeitSegConfig:
    vit: ViTConfig = field(default_factory=lambda: ViTConfig(arch="beit"))
    num_labels: int = 12
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)  # 1-based block outputs
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    bn_eps: float = 1e-5


# --------------------------------------------------------------------------- #
# params
# --------------------------------------------------------------------------- #
def _bn_init(c: int) -> Dict[str, Any]:
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv_init(rng, kh, kw, cin, cout, bias=False) -> Dict[str, Any]:
    p = {"kernel": normal_init(rng, (kh, kw, cin, cout), (kh * kw * cin) ** -0.5)}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def init_beit_seg_params(rng: jax.Array, cfg: BeitSegConfig) -> Dict[str, Any]:
    D = cfg.vit.hidden_size
    ks = iter(jax.random.split(rng, 32))
    conv_mod = lambda k, kh, cin: {"conv": _conv_init(k, kh, kh, cin, D), "bn": _bn_init(D)}
    return {
        "backbone": init_vit_params(next(ks), cfg.vit),
        "fpn1": {
            "deconv1": _conv_init(next(ks), 2, 2, D, D, bias=True),
            "bn": _bn_init(D),
            "deconv2": _conv_init(next(ks), 2, 2, D, D, bias=True),
        },
        "fpn2": {"deconv1": _conv_init(next(ks), 2, 2, D, D, bias=True)},
        "psp": [conv_mod(next(ks), 1, D) for _ in cfg.pool_scales],
        "bottleneck": conv_mod(next(ks), 3, D * (1 + len(cfg.pool_scales))),
        "laterals": [conv_mod(next(ks), 1, D) for _ in range(3)],
        "fpn_convs": [conv_mod(next(ks), 3, D) for _ in range(3)],
        "fpn_bottleneck": conv_mod(next(ks), 3, 4 * D),
        "classifier": _conv_init(next(ks), 1, 1, D, cfg.num_labels, bias=True),
    }


# --------------------------------------------------------------------------- #
# primitives (NHWC)
# --------------------------------------------------------------------------- #
def _conv(x: jax.Array, p: Dict[str, Any], padding: str = "SAME") -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _bn(x: jax.Array, p: Dict[str, Any], eps: float) -> jax.Array:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x - p["mean"]) * inv * p["w"] + p["b"]).astype(x.dtype)


def _conv_module(x: jax.Array, p: Dict[str, Any], eps: float) -> jax.Array:
    """BeitConvModule: conv (no bias) + BN + ReLU."""
    return jax.nn.relu(_bn(_conv(x, p["conv"]), p["bn"], eps))


def _deconv2x2(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    """ConvTranspose2d(k=2, s=2) as einsum + pixel shuffle (exact: output
    pixel (2i+a, 2j+b) = sum_ci x[i,j,ci] * W[a,b,ci,co])."""
    B, H, W, C = x.shape
    y = jnp.einsum("bhwc,xyco->bhxwyo", x, p["kernel"].astype(x.dtype))
    y = y.reshape(B, 2 * H, 2 * W, -1)
    return y + p["bias"].astype(y.dtype)


def _maxpool2(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return jnp.max(x.reshape(B, H // 2, 2, W // 2, 2, C), axis=(2, 4))


def _resize(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear, half-pixel centers (torch align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear", antialias=False)


def _adaptive_avg_pool(x: jax.Array, s: int) -> jax.Array:
    """torch adaptive_avg_pool2d bin edges: [floor(i*H/s), ceil((i+1)*H/s))."""
    B, H, W, C = x.shape
    rows = [(int(np.floor(i * H / s)), int(np.ceil((i + 1) * H / s))) for i in range(s)]
    cols = [(int(np.floor(j * W / s)), int(np.ceil((j + 1) * W / s))) for j in range(s)]
    out = jnp.stack(
        [
            jnp.stack([jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)) for (c0, c1) in cols], axis=1)
            for (r0, r1) in rows
        ],
        axis=1,
    )  # (B, s, s, C)
    return out


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def beit_segment_logits(params: Dict[str, Any], cfg: BeitSegConfig, pixels: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, H/4, W/4, num_labels) logits
    (HF returns logits at patch_resolution*4; upsample + argmax downstream)."""
    eps = cfg.bn_eps
    g = cfg.vit.grid
    B = pixels.shape[0]
    _, per_layer = vit_encode(params["backbone"], cfg.vit, pixels, return_hidden_states=True)

    feats: List[jax.Array] = []
    for oi in cfg.out_indices:
        assert oi >= 2, "out_index 1 (pre-block embeddings) unsupported"
        h = per_layer[oi - 2]  # block (oi-1) output, 0-based; = HF hidden_states[oi-1]
        feats.append(h[:, 1:, :].reshape(B, g, g, -1))  # drop CLS -> NHWC

    # multi-scale adapters (modeling_beit.py fpn1..fpn4)
    f1 = _deconv2x2(
        jax.nn.gelu(_bn(_deconv2x2(feats[0], params["fpn1"]["deconv1"]), params["fpn1"]["bn"], eps), approximate=False),
        params["fpn1"]["deconv2"],
    )  # 4x
    f2 = _deconv2x2(feats[1], params["fpn2"]["deconv1"])  # 2x
    f3 = feats[2]
    f4 = _maxpool2(feats[3])  # 0.5x
    feats = [f1, f2, f3, f4]

    # PSP on the top feature
    top = feats[-1]
    th, tw = top.shape[1], top.shape[2]
    psp_outs = [top]
    for scale, p in zip(cfg.pool_scales, params["psp"]):
        pooled = _conv_module(_adaptive_avg_pool(top, scale), p, eps)
        psp_outs.append(_resize(pooled, th, tw))
    psp = _conv_module(jnp.concatenate(psp_outs, axis=-1), params["bottleneck"], eps)

    # laterals + top-down
    laterals = [_conv_module(feats[i], params["laterals"][i], eps) for i in range(3)] + [psp]
    for i in range(3, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _resize(
            laterals[i], laterals[i - 1].shape[1], laterals[i - 1].shape[2]
        )

    fpn_outs = [_conv_module(laterals[i], params["fpn_convs"][i], eps) for i in range(3)] + [laterals[3]]
    h0, w0 = fpn_outs[0].shape[1], fpn_outs[0].shape[2]
    fpn_outs = [fpn_outs[0]] + [_resize(f, h0, w0) for f in fpn_outs[1:]]
    out = _conv_module(jnp.concatenate(fpn_outs, axis=-1), params["fpn_bottleneck"], eps)
    return _conv(out, params["classifier"])  # (B, 4g, 4g, num_labels)


def segment_map(params: Dict[str, Any], cfg: BeitSegConfig, pixels: jax.Array) -> jax.Array:
    """(B, H, W, 3) -> (B, H, W) int32 class map (logits upsampled to the
    input size + argmax — the map LayoutModelDIT post-processes,
    src/_modules.py:440-465)."""
    logits = beit_segment_logits(params, cfg, pixels)
    logits = _resize(logits, pixels.shape[1], pixels.shape[2])
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def make_dit_detector(params: Dict[str, Any], cfg: BeitSegConfig):
    """Returns a detector callable for models.layout.LayoutProvider:
    image (H, W, 3) uint8 -> (normalized boxes, 4-class labels) via the
    segmentation map + the existing mask->boxes->filter post-processing
    (src/_modules.py:440-511)."""
    from rag_docvqa_tpu.models.layout import filter_detections_dit, segmentation_to_layout
    from rag_docvqa_tpu.ops.patches import resize_image

    size = cfg.vit.image_size

    def detector(image: np.ndarray):
        img = resize_image(np.asarray(image), size, size) / 255.0
        pix = jnp.asarray(((img - 0.5) / 0.5)[None], jnp.float32)
        seg = np.asarray(segment_map(params, cfg, pix))[0]
        raw_boxes, raw_labels = segmentation_to_layout(seg)
        return filter_detections_dit(raw_boxes, raw_labels, (size, size))

    return detector


# --------------------------------------------------------------------------- #
# HF conversion (BeitForSemanticSegmentation)
# --------------------------------------------------------------------------- #
def convert_beit_seg_state_dict(sd: Dict[str, np.ndarray], cfg: BeitSegConfig) -> Dict[str, Any]:
    a = lambda k: jnp.asarray(np.asarray(sd[k]))

    def conv_k(k):  # torch conv (O, I, kh, kw) -> HWIO
        return jnp.asarray(np.transpose(np.asarray(sd[k]), (2, 3, 1, 0)))

    def deconv_k(k):  # torch ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O)
        return jnp.asarray(np.transpose(np.asarray(sd[k]), (2, 3, 0, 1)))

    def bn(prefix):
        return {"w": a(prefix + ".weight"), "b": a(prefix + ".bias"),
                "mean": a(prefix + ".running_mean"), "var": a(prefix + ".running_var")}

    def conv_mod(prefix):
        return {"conv": {"kernel": conv_k(prefix + ".conv.weight")}, "bn": bn(prefix + ".bn")}

    backbone_sd = {k[len("beit."):]: v for k, v in sd.items() if k.startswith("beit.")}
    return {
        "backbone": convert_vit_state_dict(backbone_sd, cfg.vit),
        "fpn1": {
            "deconv1": {"kernel": deconv_k("fpn1.0.weight"), "bias": a("fpn1.0.bias")},
            "bn": bn("fpn1.1"),
            "deconv2": {"kernel": deconv_k("fpn1.3.weight"), "bias": a("fpn1.3.bias")},
        },
        "fpn2": {"deconv1": {"kernel": deconv_k("fpn2.0.weight"), "bias": a("fpn2.0.bias")}},
        "psp": [conv_mod(f"decode_head.psp_modules.{i}.1") for i in range(len(cfg.pool_scales))],
        "bottleneck": conv_mod("decode_head.bottleneck"),
        "laterals": [conv_mod(f"decode_head.lateral_convs.{i}") for i in range(3)],
        "fpn_convs": [conv_mod(f"decode_head.fpn_convs.{i}") for i in range(3)],
        "fpn_bottleneck": conv_mod("decode_head.fpn_bottleneck"),
        "classifier": {"kernel": conv_k("decode_head.classifier.weight"),
                       "bias": a("decode_head.classifier.bias")},
    }
