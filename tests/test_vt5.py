"""VT5 composite model: shapes, loss, generation, spatial/visual embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.data.contract import GeneratorInputs
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig, get_visual_boxes, init_spatial_params, spatial_embed
from rag_docvqa_tpu.models.vit import ViTConfig, init_vit_params, vit_encode

TINY_VT5 = vt5m.VT5Config(
    t5=t5m.T5Config(
        vocab_size=300, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
    ),
    spatial=SpatialConfig(max_2d_positions=1024, hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=2, num_heads=2, mlp_dim=32, patch_size=8, image_size=32),
    use_layout_labels="Embed",
)


@pytest.fixture(scope="module")
def params():
    return vt5m.init_vt5_params(jax.random.PRNGKey(0), TINY_VT5)


def make_gen(B=2, S=20):
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 300, size=(B, S)).astype(np.int32)
    boxes = rng.randint(0, 1000, size=(B, S, 4)).astype(np.int32)
    labels = rng.randint(0, 6, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)
    return GeneratorInputs(
        input_ids=jnp.asarray(ids),
        input_boxes=jnp.asarray(boxes),
        input_labels=jnp.asarray(labels),
        attention_mask=jnp.asarray(mask),
    )


def test_spatial_embed_shapes():
    cfg = SpatialConfig(hidden_size=32, dropout_rate=0.0)
    p = init_spatial_params(jax.random.PRNGKey(0), cfg)
    out = spatial_embed(p, cfg, jnp.zeros((2, 5, 4), jnp.int32))
    assert out.shape == (2, 5, 32)
    # out-of-range boxes are clipped, not crashing
    out2 = spatial_embed(p, cfg, jnp.full((1, 2, 4), 5000, jnp.int32))
    assert np.isfinite(np.asarray(out2)).all()


def test_visual_boxes_grid():
    boxes = get_visual_boxes(num_pages=2)
    assert boxes.shape == (2, 197, 4)
    assert boxes[0, 0].tolist() == [0, 0, 1, 1]
    np.testing.assert_allclose(np.asarray(boxes[0, 1]), [0, 0, 1 / 14, 1 / 14])


def test_vit_encode_shapes():
    cfg = ViTConfig(hidden_size=16, num_layers=2, num_heads=2, mlp_dim=32, patch_size=8, image_size=32)
    p = init_vit_params(jax.random.PRNGKey(0), cfg)
    out = vit_encode(p, cfg, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 1 + 16, 16)


@pytest.mark.slow
def test_vt5_train_loss_and_grads(params):
    gen = make_gen()
    labels = jnp.asarray([[5, 6, 1, -100], [7, 1, -100, -100]], jnp.int32)

    def loss_fn(p):
        loss, _ = vt5m.forward_train(p, TINY_VT5, gen, labels)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(x * x), grads, 0.0)
    assert float(gnorm) > 0


def test_vt5_generate_with_visual(params):
    gen = make_gen()
    images = jnp.zeros((2, 32, 32, 3))
    vis = vt5m.visual_features(params, TINY_VT5, images)
    assert vis.shape == (2, 17, 32)
    tokens, conf = vt5m.generate(params, TINY_VT5, gen, visual=vis, max_new_tokens=5)
    assert tokens.shape == (2, 5)
    assert conf.shape == (2,)


def test_vt5_hf_parity_spatial():
    """SpatialEmbeddings math matches the reference formula on fixed weights."""
    cfg = SpatialConfig(max_2d_positions=16, hidden_size=4, dropout_rate=0.0)
    p = init_spatial_params(jax.random.PRNGKey(1), cfg)
    bbox = jnp.asarray([[[1, 2, 3, 4]]], jnp.int32)
    out = spatial_embed(p, cfg, bbox)
    emb = p["x_emb"][1] + p["y_emb"][2] + p["x_emb"][3] + p["y_emb"][4]
    mu, var = emb.mean(), emb.var()
    normed = (emb - mu) / jnp.sqrt(var + 1e-12) * p["ln_w"] + p["ln_b"]
    want = normed @ p["matcher"]["kernel"] + p["matcher"]["bias"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(want), rtol=1e-5)
