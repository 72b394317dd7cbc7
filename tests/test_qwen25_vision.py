"""Faithful Qwen2.5-VL vision tower: HF parity on a tiny random model.

The reference's visual inputs go through this tower
(src/QwenVLInstruct.py:85-160); weight compatibility means real
Qwen2.5-VL checkpoints convert directly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.qwen25_vision import (
    Qwen25VisionConfig,
    convert_qwen25_vision_state_dict,
    encode_features,
    encode_image,
    extract_qwen_patches,
    init_qwen25_vision_params,
)

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity

CFG = Qwen25VisionConfig(
    hidden_size=32, intermediate_size=64, num_heads=4, depth=4,
    patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
    window_size=16,  # -> merger window of 2x2 merged cells
    out_hidden_size=48, fullatt_block_indexes=(1, 3),
)
GRID = (8, 8)  # 32x32 image, 4px patches


@pytest.fixture(scope="module")
def hf_pair():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    hf_cfg = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, out_hidden_size=48, fullatt_block_indexes=[1, 3],
        in_channels=3, hidden_act="silu",
    )
    torch.manual_seed(0)
    hf = Qwen2_5_VisionTransformerPretrainedModel._from_config(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_qwen25_vision_state_dict(sd, CFG))
    return hf, params


def test_hf_parity_tower(hf_pair):
    hf, params = hf_pair
    rng = np.random.RandomState(0)
    seq = GRID[0] * GRID[1]
    feats = rng.randn(seq, CFG.patch_dim).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(feats),
            grid_thw=torch.tensor([[1, GRID[0], GRID[1]]]),
        ).numpy()  # (seq/4, out)

    ours = encode_features(params, CFG, jnp.asarray(feats)[None], GRID)
    np.testing.assert_allclose(np.asarray(ours)[0], hf_out, rtol=3e-4, atol=3e-4)


def test_hf_parity_batched(hf_pair):
    """Batched encode equals per-image HF calls."""
    hf, params = hf_pair
    rng = np.random.RandomState(1)
    seq = GRID[0] * GRID[1]
    feats = rng.randn(3, seq, CFG.patch_dim).astype(np.float32)
    ours = np.asarray(encode_features(params, CFG, jnp.asarray(feats), GRID))
    for b in range(3):
        with torch.no_grad():
            hf_out = hf(torch.from_numpy(feats[b]), grid_thw=torch.tensor([[1, *GRID]])).numpy()
        np.testing.assert_allclose(ours[b], hf_out, rtol=3e-4, atol=3e-4)


def test_image_extraction_roundtrip(hf_pair):
    """encode_image == extraction + tower; extraction layout feeds HF
    identically (the processor's merge-order (C, T, ph, pw) flattening)."""
    hf, params = hf_pair
    rng = np.random.RandomState(2)
    pix = rng.randn(1, 32, 32, 3).astype(np.float32)
    feats = np.asarray(extract_qwen_patches(jnp.asarray(pix), CFG))
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(feats[0]), grid_thw=torch.tensor([[1, *GRID]])).numpy()
    ours = np.asarray(encode_image(params, CFG, jnp.asarray(pix)))[0]
    np.testing.assert_allclose(ours, hf_out, rtol=3e-4, atol=3e-4)


def test_random_init_shapes():
    params = init_qwen25_vision_params(jax.random.PRNGKey(0), CFG)
    pix = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3), jnp.float32)
    out = encode_image(params, CFG, pix)
    assert out.shape == (2, (GRID[0] // 2) * (GRID[1] // 2), CFG.out_hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_hf_parity_padded_window_grid(hf_pair):
    """Grid not divisible by the merger window (llm grid 5x4, window 2):
    exercises the -100-padded window partition (get_window_index)."""
    hf, params = hf_pair
    rng = np.random.RandomState(3)
    grid = (10, 8)  # 40x32 image, 4px patches
    seq = grid[0] * grid[1]
    feats = rng.randn(seq, CFG.patch_dim).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(feats), grid_thw=torch.tensor([[1, *grid]])).numpy()
    ours = encode_features(params, CFG, jnp.asarray(feats)[None], grid)
    np.testing.assert_allclose(np.asarray(ours)[0], hf_out, rtol=3e-4, atol=3e-4)
