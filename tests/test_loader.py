"""Checkpoint loading: HF dirs + Orbax dirs -> engine param trees.

Covers the reference's from_pretrained startup path (src/VT5.py:63-77
non-strict safetensors load; eval.py:443-570 builds everything from
checkpoints) as re-designed in models/loader.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.loader import (
    convert_vt5_checkpoint,
    load_orbax_params,
    load_vt5_params,
    read_state_dict,
)
from rag_docvqa_tpu.models.vit import ViTConfig

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


TINY = t5m.T5Config(
    vocab_size=128, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
)
VT5_CFG = vt5m.VT5Config(
    t5=TINY, spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                  patch_size=8, image_size=16),
    use_visual=False,
)


@pytest.fixture(scope="module")
def hf_t5():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    return T5ForConditionalGeneration(
        HFT5Config(
            vocab_size=128, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
            feed_forward_proj="relu", tie_word_embeddings=True,
            decoder_start_token_id=0,
        )
    ).eval()


def test_bare_t5_dir_load(tmp_path, hf_t5):
    """A plain T5 save_pretrained dir loads into the t5 subtree; untouched
    components keep their random init (non-strict semantics)."""
    d = tmp_path / "t5"
    hf_t5.save_pretrained(d)
    init = vt5m.init_vt5_params(jax.random.PRNGKey(0), VT5_CFG)
    params = load_vt5_params(str(d), VT5_CFG, init)
    np.testing.assert_array_equal(
        np.asarray(params["t5"]["shared"]),
        hf_t5.get_input_embeddings().weight.detach().numpy(),
    )
    # spatial untouched by a bare-T5 checkpoint
    np.testing.assert_array_equal(
        np.asarray(params["spatial"]["x_emb"]), np.asarray(init["spatial"]["x_emb"])
    )
    # loaded params drive the forward path
    ids = jnp.zeros((1, 4), jnp.int32)
    emb = params["t5"]["shared"][ids]
    h = t5m.encode(jax.tree.map(jnp.asarray, params["t5"]), TINY, emb, jnp.ones((1, 4), bool))
    assert np.isfinite(np.asarray(h)).all()


def test_full_vt5_state_dict_conversion(tmp_path, hf_t5):
    """A reference-shaped VT5 state dict (language_backbone./spatial_embedding.
    prefixes, src/VT5.py:30-38) maps onto the full tree, and spatial outputs
    match a torch re-computation."""
    from safetensors.torch import save_file

    d_model = 32
    torch.manual_seed(1)
    sd = {f"language_backbone.{k}": v for k, v in hf_t5.state_dict().items()}
    sd["spatial_embedding.x_position_embeddings.weight"] = torch.randn(1024, d_model)
    sd["spatial_embedding.y_position_embeddings.weight"] = torch.randn(1024, d_model)
    sd["spatial_embedding.LayerNorm.weight"] = torch.randn(d_model)
    sd["spatial_embedding.LayerNorm.bias"] = torch.randn(d_model)
    sd["spatial_embedding.spatial_emb_matcher.layers.0.weight"] = torch.randn(d_model, d_model)
    sd["spatial_embedding.spatial_emb_matcher.layers.0.bias"] = torch.randn(d_model)

    ckpt = tmp_path / "vt5"
    ckpt.mkdir()
    save_file({k: v.clone().contiguous() for k, v in sd.items()}, ckpt / "model.safetensors")

    params = load_vt5_params(str(ckpt), VT5_CFG)
    assert set(params) >= {"t5", "spatial"}

    # spatial parity vs torch recompute
    from rag_docvqa_tpu.models.embeddings import spatial_embed

    boxes = np.random.RandomState(0).randint(0, 1000, (2, 5, 4)).astype(np.int32)
    ours = spatial_embed(jax.tree.map(jnp.asarray, params["spatial"]), VT5_CFG.spatial, jnp.asarray(boxes))
    bt = torch.from_numpy(boxes).long()
    x = sd["spatial_embedding.x_position_embeddings.weight"]
    y = sd["spatial_embedding.y_position_embeddings.weight"]
    ref = x[bt[..., 0]] + y[bt[..., 1]] + x[bt[..., 2]] + y[bt[..., 3]]
    ref = torch.nn.functional.layer_norm(
        ref, (d_model,), sd["spatial_embedding.LayerNorm.weight"],
        sd["spatial_embedding.LayerNorm.bias"], eps=1e-12,
    )
    ref = ref @ sd["spatial_embedding.spatial_emb_matcher.layers.0.weight"].T + sd[
        "spatial_embedding.spatial_emb_matcher.layers.0.bias"
    ]
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_sharded_safetensors_index(tmp_path, hf_t5):
    """Sharded checkpoints (model.safetensors.index.json) are reassembled."""
    import json

    from safetensors.torch import save_file

    sd = {k: v.clone().contiguous() for k, v in hf_t5.state_dict().items()}
    keys = sorted(sd)
    half = len(keys) // 2
    d = tmp_path / "sharded"
    d.mkdir()
    save_file({k: sd[k] for k in keys[:half]}, d / "model-00001-of-00002.safetensors")
    save_file({k: sd[k] for k in keys[half:]}, d / "model-00002-of-00002.safetensors")
    weight_map = {k: "model-00001-of-00002.safetensors" for k in keys[:half]}
    weight_map.update({k: "model-00002-of-00002.safetensors" for k in keys[half:]})
    (d / "model.safetensors.index.json").write_text(json.dumps({"weight_map": weight_map}))

    out = read_state_dict(str(d))
    assert set(out) == set(sd) - {"encoder.embed_tokens.weight", "decoder.embed_tokens.weight"} or set(out) == set(sd)
    np.testing.assert_array_equal(out["shared.weight"], sd["shared.weight"].numpy())


def test_orbax_roundtrip(tmp_path):
    from rag_docvqa_tpu.training.checkpoint import save_params

    params = vt5m.init_vt5_params(jax.random.PRNGKey(1), VT5_CFG)
    path = tmp_path / "export"
    save_params(str(path), params)
    like = vt5m.init_vt5_params(jax.random.PRNGKey(2), VT5_CFG)
    restored = load_orbax_params(str(path), like)
    np.testing.assert_array_equal(
        np.asarray(restored["t5"]["shared"]), np.asarray(params["t5"]["shared"])
    )


def test_orbax_manager_dir(tmp_path):
    """A CheckpointManager directory restores the best step's params."""
    import optax

    from rag_docvqa_tpu.training.checkpoint import CheckpointManager
    from rag_docvqa_tpu.training.train_step import TrainState

    params = vt5m.init_vt5_params(jax.random.PRNGKey(1), VT5_CFG)
    tx = optax.sgd(1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    mgr.save(1, state, metrics={"accuracy": 0.5})
    better = state.params
    state2 = TrainState(params=jax.tree.map(lambda x: x + 1, better), opt_state=state.opt_state, step=state.step)
    mgr.save(2, state2, metrics={"accuracy": 0.9})
    mgr.close()

    like = vt5m.init_vt5_params(jax.random.PRNGKey(3), VT5_CFG)
    restored = load_orbax_params(str(tmp_path / "run"), like)
    np.testing.assert_array_equal(
        np.asarray(restored["t5"]["shared"]), np.asarray(state2.params["t5"]["shared"])
    )


def test_prefetch_overlap_and_errors():
    """data/prefetch.py: order-preserving, bounded-depth, background-thread
    mapping; producer exceptions re-raise at the consumer."""
    import threading
    import time as _time

    import pytest as _pytest

    from rag_docvqa_tpu.data.prefetch import map_prefetch, prefetch

    main = threading.get_ident()
    seen_threads = []

    def work(i):
        seen_threads.append(threading.get_ident())
        _time.sleep(0.005)
        return i * i

    out = list(map_prefetch(work, range(10), depth=2))
    assert out == [i * i for i in range(10)]
    assert all(t != main for t in seen_threads)  # producer ran off-thread

    # overlap: consumer work and producer work should share wall time
    t0 = _time.perf_counter()
    for _ in map_prefetch(work, range(8), depth=2):
        _time.sleep(0.005)  # "device compute"
    overlapped = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    for _ in map_prefetch(work, range(8), depth=0):  # sync mode
        _time.sleep(0.005)
    sync = _time.perf_counter() - t0
    assert overlapped < sync * 0.85, (overlapped, sync)

    def boom(i):
        if i == 3:
            raise RuntimeError("producer failed")
        return i

    with _pytest.raises(RuntimeError, match="producer failed"):
        list(map_prefetch(boom, range(10), depth=2))

    # early consumer exit doesn't deadlock
    gen = prefetch(iter(range(100)), depth=2)
    assert next(gen) == 0
    gen.close()

    # ... and terminates the producer even when it is mid-ingest at close
    # time (a single drain pass would hit Empty while the producer is still
    # working, then the producer would block forever on the refilled queue)
    before = {t.ident for t in threading.enumerate()}

    def slow(i):
        _time.sleep(0.05)
        return i

    gen = map_prefetch(slow, range(100), depth=2)
    assert next(gen) == 0
    gen.close()  # producer is asleep inside slow() right now
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.name == "ingest-prefetch"]
        if not leaked:
            break
        _time.sleep(0.02)
    assert not leaked, f"prefetch producer thread leaked: {leaked}"
