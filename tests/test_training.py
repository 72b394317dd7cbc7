"""Training loop: loss decreases on a tiny overfit task; checkpoint round
trip; eval loop; config system."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.engine import RAGConfig
from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.training import TrainState, build_optimizer, make_train_step, trainable_mask
from rag_docvqa_tpu.training.trainer import TrainLoopConfig, Trainer

TOK = HashTokenizer(vocab_size=2048)
CFG = vt5m.VT5Config(
    t5=t5m.T5Config(vocab_size=2048, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                    num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0),
    spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32, patch_size=8, image_size=16),
    use_visual=False,
)
CAPS = Caps(max_pages=3, max_chunks=16, max_slots=256, tokens_per_word=8, embed_tokens=48)
RAG = RAGConfig(page_retrieval="concat", chunk_num=3, max_source_length=128, max_new_tokens=4)


def make_ingestor():
    return DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)


def test_loss_decreases_on_overfit():
    ing = make_ingestor()
    docs = make_corpus(4, n_pages=2, words_per_page=30, seed=1)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=6, seed=0))

    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=3e-3, warmup_steps=2, total_steps=200, mask=trainable_mask(params, ("t5", "spatial")))
    state = TrainState.create(params, tx)
    step = make_train_step(CFG, RAG, tx)

    first = None
    last = None
    for i in range(25):
        state, m = step(state, batch, labels)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.5, f"loss did not drop: {first} -> {last}"


def test_frozen_subtrees_not_updated():
    ing = make_ingestor()
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=2)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=1e-2, warmup_steps=1, total_steps=10, mask=trainable_mask(params, ("t5",)))
    state = TrainState.create(params, tx)
    step = make_train_step(CFG, RAG, tx)
    # copy to host BEFORE the step: donate_argnums donates the old buffers
    before_spatial = np.array(params["spatial"]["x_emb"])
    before_shared = np.array(params["t5"]["shared"])
    state, _ = step(state, batch, labels)
    state, _ = step(state, batch, labels)  # step 0 has lr=0 (warmup ramp)
    np.testing.assert_array_equal(before_spatial, np.asarray(state.params["spatial"]["x_emb"]))
    assert not np.array_equal(before_shared, np.asarray(state.params["t5"]["shared"]))


def test_trainer_fit_and_eval(tmp_path):
    ing = make_ingestor()
    train_docs = make_corpus(8, n_pages=2, words_per_page=30, seed=3)
    val_docs = make_corpus(4, n_pages=2, words_per_page=30, seed=4)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(
        CFG, RAG, params, TOK, ing,
        TrainLoopConfig(epochs=2, batch_size=4, lr=1e-3, warmup_steps=2, eval_start=False,
                        save_dir=str(tmp_path / "ckpt"), log_every=100),
    )
    out = trainer.fit(train_docs, val_docs)
    assert len(out["history"]) == 2
    assert "accuracy" in out["history"][0]
    assert trainer.ckpt.latest_step() is not None


def test_checkpoint_roundtrip(tmp_path):
    from rag_docvqa_tpu.training.checkpoint import CheckpointManager

    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, state, metrics={"accuracy": 0.5})
    zeroed = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(zeroed)
    np.testing.assert_array_equal(
        np.asarray(restored.params["t5"]["shared"]), np.asarray(state.params["t5"]["shared"])
    )
    assert int(restored.step) == 0
    mgr.close()


def test_config_system():
    from rag_docvqa_tpu.config import build_rag_config, check_config, expand_sweep, load_config

    cfg = load_config(
        model_dict={"model_name": "VT5", "chunk_num": 5, "training_parameters": {"lr": 1e-4}},
        dataset_dict={"dataset_name": "MP-DocVQA", "max_pages": None},
        overrides={"page_retrieval": "concat"},
    )
    assert cfg["lr"] == 1e-4 and cfg["chunk_num"] == 5 and cfg["seed"] == 42
    rc = build_rag_config(cfg)
    assert rc.chunk_num == 5 and rc.page_retrieval == "concat"

    with pytest.raises(ValueError):
        check_config({"model_name": "VT5", "page_retrieval": "custom"})
    with pytest.raises(ValueError):
        check_config({"model_name": "Hi-VT5", "page_retrieval": "concat"})
    check_config({"model_name": "Hi-VT5", "page_retrieval": "custom"})

    runs = list(expand_sweep({"a": [1, 2], "b": "x", "c": [3, 4]}))
    assert len(runs) == 4
    assert all(r["b"] == "x" for r in runs)


def test_nac_train_step_learns_labels():
    """The DUDE NAC BCE term (reference train.py:72-86): nac_loss decreases
    and only the NAC subtree receives those gradients (generator inputs are
    stop-gradient)."""
    ing = make_ingestor()
    docs = make_corpus(4, n_pages=2, words_per_page=30, seed=5)
    for d in docs[:2]:
        d.answer_type = "not-answerable"
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    nac_gt = jnp.asarray([t == "not-answerable" for t in aux["answer_types"]], jnp.float32)

    from rag_docvqa_tpu.models.nac import NACConfig, init_nac_params

    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    params["nac"] = init_nac_params(jax.random.PRNGKey(1), NACConfig(emb_dim=CFG.t5.d_model))
    tx = build_optimizer(lr=5e-3, warmup_steps=1, total_steps=60,
                         mask=trainable_mask(params, ("nac",)))
    state = TrainState.create(params, tx)
    step = make_train_step(CFG, RAG, tx, use_nac=True, nac_loss_weight=1.0, nac_decode_len=4)

    before_shared = np.array(params["t5"]["shared"])
    first = last = None
    for _ in range(30):
        state, m = step(state, batch, labels, nac_gt)
        if first is None:
            first = float(m["nac_loss"])
        last = float(m["nac_loss"])
    assert last < first * 0.5, f"nac loss did not drop: {first} -> {last}"
    assert float(m["nac_accuracy"]) == 1.0
    # generator untouched (only NAC trainable here)
    np.testing.assert_array_equal(before_shared, np.asarray(state.params["t5"]["shared"]))


def test_trainer_train_metrics_every(capsys):
    """train_metrics_every logs train-batch ANLS/accuracy via generation
    (reference computes them every batch, train.py:109-117)."""
    ing = make_ingestor()
    train_docs = make_corpus(4, n_pages=2, words_per_page=30, seed=6)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(
        CFG, RAG, params, TOK, ing,
        TrainLoopConfig(epochs=1, batch_size=4, lr=1e-3, warmup_steps=1,
                        eval_start=False, train_metrics_every=1, log_every=100),
    )
    trainer.fit(train_docs, [])
    out = capsys.readouterr().out
    assert "train_batch_accuracy" in out and "train_batch_anls" in out


@pytest.mark.slow
def test_trainer_hivt5_path():
    """Hi-VT5 training through the Trainer: lm+ret losses, params update."""
    from rag_docvqa_tpu.config import build_hivt5_config
    from rag_docvqa_tpu.models import hivt5 as hivt5m

    ing = make_ingestor()
    train_docs = make_corpus(4, n_pages=2, words_per_page=20, seed=7)
    cfg_dict = {"d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64, "num_layers": 2,
                "dropout_rate": 0.0, "page_tokens": 2, "max_pages": 3, "max_text_tokens": 48}
    hcfg = build_hivt5_config(cfg_dict, TOK.vocab_size)
    params = hivt5m.init_hivt5_params(jax.random.PRNGKey(0), hcfg)
    before_head = np.array(params["page_head"]["kernel"])
    trainer = Trainer(
        None, RAG, params, TOK, ing,
        TrainLoopConfig(epochs=3, batch_size=2, lr=1e-2, warmup_steps=1,
                        eval_start=False, log_every=1),
        hivt5_cfg=hcfg,
    )
    out = trainer.fit(train_docs, [])
    assert len(out["history"]) == 3
    # the page-retrieval head trained too (reference trains whole Hi-VT5)
    assert not np.array_equal(before_head, np.asarray(trainer.state.params["page_head"]["kernel"]))


@pytest.mark.slow
def test_hivt5_remat_layer_matches_plain():
    """Hi-VT5 step with remat="layer" is math-identical to the plain step —
    the pages-in-batch encode is where per-layer checkpointing matters most
    (effective batch B * n_pages)."""
    from rag_docvqa_tpu.config import build_hivt5_config
    from rag_docvqa_tpu.models import hivt5 as hivt5m
    from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

    ing = make_ingestor()
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=10)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    cfg_dict = {"d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64, "num_layers": 2,
                "dropout_rate": 0.0, "page_tokens": 2, "max_pages": 3, "max_text_tokens": 48}
    hcfg = build_hivt5_config(cfg_dict, TOK.vocab_size)
    params = hivt5m.init_hivt5_params(jax.random.PRNGKey(0), hcfg)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)

    s1 = TrainState.create(params, tx)
    s2 = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step_plain = make_hivt5_train_step(hcfg, tx)
    step_layer = make_hivt5_train_step(hcfg, tx, remat="layer")
    s1, m1 = step_plain(s1, batch, labels)
    s2, m2 = step_layer(s2, batch, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["t5"]["shared"]), np.asarray(s2.params["t5"]["shared"]),
        rtol=1e-5, atol=1e-6,
    )


def test_hivt5_bf16_compute_step():
    """Hi-VT5 mixed precision mirrors make_train_step's: f32 masters, bf16
    compute — loss tracks the f32 step within bf16 tolerance, masters and
    opt state stay f32, and it learns. (bf16 activations are also what
    engage the fused whole-layer train kernels on TPU.)"""
    from rag_docvqa_tpu.config import build_hivt5_config
    from rag_docvqa_tpu.models import hivt5 as hivt5m
    from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

    ing = make_ingestor()
    docs = make_corpus(4, n_pages=2, words_per_page=20, seed=11)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    cfg_dict = {"d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64, "num_layers": 2,
                "dropout_rate": 0.0, "page_tokens": 2, "max_pages": 3, "max_text_tokens": 48}
    hcfg = build_hivt5_config(cfg_dict, TOK.vocab_size)
    params = hivt5m.init_hivt5_params(jax.random.PRNGKey(0), hcfg)
    tx = build_optimizer(lr=3e-3, warmup_steps=2, total_steps=200)

    s32 = TrainState.create(params, tx)
    s16 = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step32 = make_hivt5_train_step(hcfg, tx)
    step16 = make_hivt5_train_step(hcfg, tx, bf16_compute=True)
    first = last = None
    for _ in range(20):
        s32, m32 = step32(s32, batch, labels)
        s16, m16 = step16(s16, batch, labels)
        if first is None:
            first = float(m16["loss"])
            np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.05)
        last = float(m16["loss"])
    assert last < first * 0.8, f"hivt5 bf16 loss did not drop: {first} -> {last}"
    assert s16.params["t5"]["shared"].dtype == jnp.float32
    for leaf in jax.tree.leaves(s16.opt_state):
        assert leaf.dtype != jnp.bfloat16


@pytest.mark.slow
def test_remat_step_matches_plain():
    """remat=True changes memory, not math: identical loss and updates."""
    ing = make_ingestor()
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=8)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10,
                         mask=trainable_mask(params, ("t5", "spatial")))

    import copy

    s1 = TrainState.create(params, tx)
    s2 = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step_plain = make_train_step(CFG, RAG, tx)
    step_remat = make_train_step(CFG, RAG, tx, remat=True)
    s1, m1 = step_plain(s1, batch, labels)
    s2, m2 = step_remat(s2, batch, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["t5"]["shared"]), np.asarray(s2.params["t5"]["shared"]),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_remat_layer_step_matches_plain():
    """remat="layer" (per-layer jax.checkpoint, T5Config.remat_layers) is the
    memory-capped variant: identical loss and updates to the plain step.
    Whole-forward remat still materializes every layer's attention residuals
    (stacked (L, B, H, T, dk)); per-layer remat is what lets t5-base train at
    B>=64 on a 16 GB chip (PERF.md §4)."""
    ing = make_ingestor()
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=9)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10,
                         mask=trainable_mask(params, ("t5", "spatial")))

    s1 = TrainState.create(params, tx)
    s2 = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step_plain = make_train_step(CFG, RAG, tx)
    step_layer = make_train_step(CFG, RAG, tx, remat="layer")
    s1, m1 = step_plain(s1, batch, labels)
    s2, m2 = step_layer(s2, batch, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["t5"]["shared"]), np.asarray(s2.params["t5"]["shared"]),
        rtol=1e-5, atol=1e-6,
    )


def test_bf16_compute_step():
    """Mixed precision: bf16 compute over f32 masters — params/opt state stay
    f32, the loss tracks the f32 step within bf16 tolerance, and it learns."""
    ing = make_ingestor()
    docs = make_corpus(4, n_pages=2, words_per_page=30, seed=9)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=6, seed=0))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=3e-3, warmup_steps=2, total_steps=200,
                         mask=trainable_mask(params, ("t5", "spatial")))

    s32 = TrainState.create(params, tx)
    s16 = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step32 = make_train_step(CFG, RAG, tx)
    step16 = make_train_step(CFG, RAG, tx, bf16_compute=True)
    first = last = None
    for i in range(20):
        s32, m32 = step32(s32, batch, labels)
        s16, m16 = step16(s16, batch, labels)
        if first is None:
            first = float(m16["loss"])
            np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=0.05)
        last = float(m16["loss"])
    assert last < first * 0.6, f"bf16 loss did not drop: {first} -> {last}"
    # master weights and optimizer state remain f32
    assert s16.params["t5"]["shared"].dtype == jnp.float32
    for leaf in jax.tree.leaves(s16.opt_state):
        assert leaf.dtype != jnp.bfloat16
