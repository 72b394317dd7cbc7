"""ViT/BEiT HF parity (the DiT visual backbone is BEiT) + grid packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models.vit import ViTConfig, convert_vit_state_dict, init_vit_params, vit_encode
from rag_docvqa_tpu.ops.patches import concatenate_patches_grid, crop_box

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'



def test_vit_hf_parity():
    from transformers import ViTConfig as HFViTConfig, ViTModel

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64, patch_size=8, image_size=32)
    hf_cfg = HFViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        patch_size=8, image_size=32, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    params = jax.tree.map(jnp.asarray, convert_vit_state_dict({k: v.numpy() for k, v in hf.state_dict().items()}, cfg))

    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(vit_encode(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_beit_hf_parity():
    from transformers import BeitConfig as HFBeitConfig, BeitModel

    cfg = ViTConfig(
        hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64, patch_size=8, image_size=32,
        arch="beit", use_abs_pos=True, use_rel_pos_bias=True, layer_scale_init=0.1,
        use_final_layernorm=False,  # HF BeitModel defaults to mean-pooling Identity
    )
    hf_cfg = HFBeitConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        patch_size=8, image_size=32, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        use_absolute_position_embeddings=True, use_relative_position_bias=True,
        use_shared_relative_position_bias=False, layer_scale_init_value=0.1,
        drop_path_rate=0.0, use_mask_token=False,
    )
    torch.manual_seed(0)
    hf = BeitModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # randomize the zero-init rel bias so the test is meaningful
    rng = np.random.RandomState(1)
    with torch.no_grad():
        for i in range(2):
            t = hf.encoder.layer[i].attention.attention.relative_position_bias.relative_position_bias_table
            t.copy_(torch.from_numpy(rng.randn(*t.shape).astype(np.float32) * 0.1))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vit_state_dict(sd, cfg))

    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(vit_encode(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_beit_init_shapes():
    cfg = ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32, patch_size=8,
                    image_size=16, arch="beit", use_abs_pos=False, use_rel_pos_bias=True,
                    layer_scale_init=0.1)
    p = init_vit_params(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" not in p
    assert "bias" not in p["blocks"]["k"]
    assert p["blocks"]["rel_bias_table"].shape == (1, cfg.num_relative_distance, 2)
    out = vit_encode(p, cfg, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 5, 16)


def test_grid_packing_and_crop():
    rng = np.random.RandomState(0)
    patches = [rng.randint(0, 255, (h, w, 3), np.uint8) for h, w in [(20, 30), (10, 25), (15, 10)]]
    grid = concatenate_patches_grid(patches)
    assert grid.ndim == 3 and grid.shape[2] == 3
    assert grid.shape[1] == 30  # widest patch defines the canvas width
    assert concatenate_patches_grid([]).shape == (5, 5, 3)

    img = rng.randint(0, 255, (100, 200, 3), np.uint8)
    crop = crop_box(img, [0.25, 0.1, 0.75, 0.5])
    assert crop.shape == (40, 100, 3)
    # swapped coordinates are reordered (src/_modules.py:2114-2118)
    crop2 = crop_box(img, [0.75, 0.5, 0.25, 0.1])
    assert crop2.shape == (40, 100, 3)
