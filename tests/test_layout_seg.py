"""BEiT semantic-segmentation head: HF BeitForSemanticSegmentation parity.

Completes component #7 (LayoutModelDIT, SURVEY §2.1): the decode head that
produces the (H, W) class map the existing mask_to_boxes/filter_detections_dit
post-processing consumes (reference src/_modules.py:293-619).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layout_seg import (
    BeitSegConfig,
    beit_segment_logits,
    convert_beit_seg_state_dict,
    init_beit_seg_params,
    make_dit_detector,
    segment_map,
)
from rag_docvqa_tpu.models.vit import ViTConfig

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity

CFG = BeitSegConfig(
    vit=ViTConfig(
        hidden_size=32, num_layers=5, num_heads=4, mlp_dim=64, patch_size=16,
        image_size=64, arch="beit", use_abs_pos=False, use_rel_pos_bias=True,
        layer_scale_init=0.1, use_final_layernorm=False,
    ),
    num_labels=12,
    out_indices=(2, 3, 4, 5),
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import BeitConfig, BeitForSemanticSegmentation

    hf_cfg = BeitConfig(
        image_size=64, patch_size=16, hidden_size=32, num_hidden_layers=5,
        num_attention_heads=4, intermediate_size=64, num_labels=12,
        out_indices=list(CFG.out_indices), use_relative_position_bias=True,
        use_absolute_position_embeddings=False, use_mean_pooling=True,
        layer_scale_init_value=0.1, use_auxiliary_head=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf = BeitForSemanticSegmentation(hf_cfg).eval()
    # randomize BN running stats so inference-mode BN is actually exercised
    with torch.no_grad():
        for m in hf.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_beit_seg_state_dict(sd, CFG))
    return hf, params


def test_hf_parity_segmentation_logits(hf_pair):
    hf, params = hf_pair
    rng = np.random.RandomState(0)
    pix = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)))
    hf_logits = out.logits.numpy()  # (B, 12, 16, 16)

    ours = beit_segment_logits(params, CFG, jnp.asarray(pix))  # (B, 16, 16, 12)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), hf_logits, rtol=2e-4, atol=2e-4
    )


def test_hf_parity_class_map(hf_pair):
    hf, params = hf_pair
    rng = np.random.RandomState(1)
    pix = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        logits = hf(pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2))).logits
        up = torch.nn.functional.interpolate(logits, size=(64, 64), mode="bilinear", align_corners=False)
        hf_map = up.argmax(1).numpy()
    ours = np.asarray(segment_map(params, CFG, jnp.asarray(pix)))
    # identical up to argmax ties at float tolerance
    agree = (ours == hf_map).mean()
    assert agree > 0.99, f"class maps diverge: {agree:.3f} agreement"


def test_detector_plugs_into_layout_provider(hf_pair):
    _, params = hf_pair
    from rag_docvqa_tpu.models.layout import LayoutProvider

    det = make_dit_detector(params, CFG)
    img = (np.random.RandomState(2).rand(96, 80, 3) * 255).astype(np.uint8)
    boxes, labels = det(img)
    assert isinstance(boxes, list) and isinstance(labels, list)
    for b in boxes:
        assert 0.0 <= b[0] <= b[2] <= 1.0 and 0.0 <= b[1] <= b[3] <= 1.0
    provider = LayoutProvider(detector=det)
    layout = provider.page_layout(image=img)
    assert set(layout) >= {"boxes", "labels"}
