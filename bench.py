"""Headline benchmark: embed + retrieve throughput (pages/sec/chip).

Measures the BASELINE.json north-star pipeline on one chip:
  pre-tokenized page chunks -> VT5-table chunk embeddings (batched XLA)
  -> L2-normalized HBM index -> fused Pallas cosine+top-k queries.

`vs_baseline` compares against the *reference execution structure* run on the
same chip: a per-document loop issuing separate dispatches for chunk
embedding, cosine similarity, and top-k — which is how Pikurrot/RAG-DocVQA
executes retrieval (BiEncoder.batch_forward per-sample loop
src/_modules.py:1415-1416, Retriever._get_similarities per-sample loop
src/_modules.py:1978-2016). Same math, same hardware. The baseline loop is
measured WITHOUT per-step host syncs (the reference syncs per sample, which
would add full host round trips), so the reported speedup is a lower bound on
the design delta.

Timing note: on the tunneled TPU platform, block_until_ready does not reliably
wait for remote execution; every timed region therefore ends with a host fetch
of a value data-dependent on the full computation, and many reps amortize the
tunnel round trip. Every metric is the BEST of 3 windows (_time_min): the
tunnel exhibits intermittent multi-second stalls (two identical windows
measured 346 ms vs 1882 ms back to back), so a single-window mean measures
the tunnel's mood, not the chip.

Prints ONE JSON line.
"""

from __future__ import annotations

import functools
import json
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: compiles dominate bench wall time (~25 min run,
# ~1 min of timed device work). On a real TPU host warm runs skip them; the
# tunneled axon backend measured no benefit (AOT path bypasses the cache),
# but the config is harmless there.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_rag_docvqa")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# ---- workload --------------------------------------------------------------
N_DOCS = 512
PAGES_PER_DOC = 8
CHUNKS_PER_PAGE = 2
CHUNK_TOKENS = 64
D_MODEL = 768
VOCAB = 32128
N_QUERIES = 256
QUERY_TOKENS = 16
TOP_K = 10
FUSED_REPS = 20
BASELINE_DOCS = 64  # per-doc loop timed on a subsample, then extrapolated

N_PAGES = N_DOCS * PAGES_PER_DOC
N_CHUNKS = N_PAGES * CHUNKS_PER_PAGE


def _sync(x) -> float:
    """Force completion with a host fetch; returns a scalar."""
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def _time_min(call, reps: int, windows: int = 3) -> float:
    """Best-of-`windows` average seconds per call.

    The tunneled TPU shows intermittent multi-second stalls (identical
    back-to-back windows measured 346 ms vs 1882 ms); the minimum window is
    the device's actual throughput, the mean is the tunnel's mood."""
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = call()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _device_health_tflops() -> Tuple[float, float]:
    """(attained bf16 MXU TFLOP/s, per-dispatch overhead ms), RTT-cancelled.

    Times a 4-chain and a 12-chain of 8192^2 bf16 matmuls (single dispatch
    each, tiny tap fetched) and reports the MARGINAL rate over the extra 8
    matmuls — the difference cancels the tunnel's dispatch+fetch overhead.
    The previous single-matmul probe divided ~7 ms of MXU work by
    (work + RTT): in a window where dispatch overhead inflated to ~20 ms it
    read 32 "TFLOP/s" while the marginal rate was 189 and every bench
    section (100s-of-ms programs, reps pipelined before one sync) measured
    healthy — a 15-minute false-negative wait. Windows that slow the device
    itself still read slow here; RTT-only windows no longer do. The
    dispatch overhead rides along as taint info for the few reps=1
    sections whose programs run <100 ms."""
    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), dtype=jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (8192, 8192), dtype=jnp.bfloat16)

    def chain(n):
        def f(a, b):
            x = a
            for _ in range(n):
                x = x @ b
            return x[0, :8].astype(jnp.float32)
        return jax.jit(f)

    times = {}
    for n in (4, 12):
        f = chain(n)
        _sync(f(a, b))
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            _sync(f(a, b))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    marginal = times[12] - times[4]
    if marginal <= 0.1 * times[4]:
        # A 12-chain cannot legitimately cost less than ~3x a 4-chain of the
        # same matmul: an inverted/compressed pair means timing noise swamped
        # the probe (exactly the unstable windows the gate exists to detect).
        # Report "indeterminate, unhealthy" so the caller re-measures instead
        # of clamping the marginal to 1e-6 and reading ~9e6 "TFLOP/s".
        return 0.0, times[4] * 1e3
    tflops = 8 * 2 * 8192**3 / marginal / 1e12
    dispatch_ms = max(times[4] - 4 * 2 * 8192**3 / (tflops * 1e12), 0.0) * 1e3
    return tflops, dispatch_ms


def _wait_for_healthy_device(min_tflops: float = 80.0, max_wait_s: float = 900.0):
    """The tunneled chip has DEGRADED WINDOWS: hours-scale periods where the
    SAME programs run uniformly 7-25x slower (measured back to back within
    one hour: 8k bf16 matmul 150+ vs 29 TFLOP/s, 1 GB f32 reduction 230 vs
    9.6 GB/s, two-phase 512k query 4.6 vs 31.5 ms). best-of-N windows dodge
    transient stalls but not a persistent window, so a bench that starts
    inside one would record the tunnel's state, not the framework's. Wait
    (bounded) for a healthy probe; proceed regardless after max_wait_s and
    let `device_health_tflops` in the detail record the chip state."""
    import sys as _sys

    t0 = time.perf_counter()
    health, dispatch_ms = _device_health_tflops()
    while health < min_tflops and time.perf_counter() - t0 < max_wait_s:
        print(f"device degraded ({health:.0f} TFLOP/s bf16 marginal, "
              f"{dispatch_ms:.0f} ms/dispatch) — waiting for a healthy window",
              file=_sys.stderr, flush=True)
        time.sleep(60)
        health, dispatch_ms = _device_health_tflops()
    return health, dispatch_ms, time.perf_counter() - t0


def main():
    from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
    from rag_docvqa_tpu.data.synthetic import make_corpus
    from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, retrieve_device
    from rag_docvqa_tpu.models import t5 as t5m
    from rag_docvqa_tpu.models import vt5 as vt5m
    from rag_docvqa_tpu.models.embedder import mean_pool
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.ops.chunking import ChunkSpec
    from rag_docvqa_tpu.ops.gather import assemble_concat
    from rag_docvqa_tpu.ops.topk import cosine_topk_auto, cosine_topk_pallas, l2_normalize

    rng = np.random.RandomState(0)
    backend = jax.default_backend()
    health_tflops, dispatch_ms, health_wait_s = (
        _wait_for_healthy_device() if backend == "tpu" else (0.0, 0.0, 0.0)
    )

    # ---- end-to-end retrieve -> generate (t5-base VT5) ------------------------
    # FIRST on purpose: the decode's ~2.4 GB contiguous cross-KV needs a clean
    # HBM pool — after the corpus-scale sections fragment it, the same program
    # measured 1.9 s/batch (paging) vs ~350 ms here.
    E2E_B, E2E_PAGES, E2E_NEW = 128, 8, 16
    tok = HashTokenizer(vocab_size=VOCAB)
    # t5-base dims; flash encoder attention on TPU (what RAGVT5Engine enables)
    # + int8 cross-KV decode cache (halves the dominant decode HBM read,
    # models/t5.py:56-61 — the engine-exposed decode_kv_int8 option)
    t5_cfg = t5m.T5Config(vocab_size=VOCAB, dropout_rate=0.0,
                          flash_encoder=backend == "tpu",
                          decode_kv_int8=True)
    vt5_cfg = vt5m.VT5Config(t5=t5_cfg, spatial=SpatialConfig(hidden_size=768, dropout_rate=0.0),
                             use_visual=False)
    rag = RAGConfig(page_retrieval="concat", chunk_num=TOP_K, max_source_length=512,
                    max_new_tokens=E2E_NEW)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=60, overlap=10))
    docs = make_corpus(E2E_B, n_pages=E2E_PAGES, words_per_page=120, seed=0)
    ing.caps = ing.plan_caps(docs)  # sized to the corpus: no truncation warning
    batch, _ = ing.ingest(docs)
    # commit the batch to HBM once: re-transferring ~30 MB of host arrays per
    # rep measured ~35 ms of tunnel serialization that a production input
    # pipeline (async prefetch) would overlap
    batch = jax.device_put(batch)
    vt5_params = vt5m.init_vt5_params(jax.random.PRNGKey(0), vt5_cfg)
    vt5_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        vt5_params,
    )
    acfg = rag.assemble()

    # split dispatch (ops/decode.py::greedy_decode_split): encoder program,
    # then cache build + decode loop as separate programs — the decode loop
    # runs ~2.5x faster when the cross-KV cache arrives as a program input
    # (measured 7.8 -> 3.1 ms/step; in-program XLA relayout-copies the cache
    # and reads it slower inside the while loop)
    from rag_docvqa_tpu.ops.decode import greedy_decode_split

    @jax.jit
    def e2e_enc_part(params, batch):
        ret = retrieve_device(params["t5"]["shared"], batch, k=TOP_K)
        gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, acfg)
        embeds, mask = vt5m.input_embeds(params, vt5_cfg, gen)
        return t5m.encode(params["t5"], t5_cfg, embeds, mask), mask

    def e2e(params, batch):
        enc, mask = e2e_enc_part(params, batch)
        _, conf = greedy_decode_split(params["t5"], t5_cfg, enc, mask, E2E_NEW)
        return conf

    _sync(e2e(vt5_params, batch))
    e2e_time = _time_min(lambda: e2e(vt5_params, batch), 5)
    e2e_pages_per_sec = E2E_B * E2E_PAGES / e2e_time
    # t5-base: ~110M encoder-side params seen by enc tokens, ~113M decoder+enc
    # params per decode token (cache reuse) — 2*P*T approximation
    enc_params = 12 * (4 * 768 * 768 + 2 * 768 * 3072)
    dec_params = 12 * (8 * 768 * 768 + 2 * 768 * 3072) + 768 * VOCAB
    e2e_flops = (2 * enc_params * E2E_B * 512) + (2 * dec_params * E2E_B * E2E_NEW)
    e2e_mfu = e2e_flops / e2e_time / 197e12 if backend == "tpu" else 0.0

    # ---- e2e stage split: retrieve+assemble | +encode | +decode --------------
    # Each stage program ends in a small reduction (the tunnel streams big jit
    # outputs back to the host, so returning activations would time transfer,
    # not compute); stage cost = difference of cumulative-prefix walls.
    @jax.jit
    def e2e_assemble(params, batch):
        ret = retrieve_device(params["t5"]["shared"], batch, k=TOP_K)
        gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, acfg)
        return jnp.sum(gen.input_ids) + jnp.sum(ret.top_k_idx)

    @jax.jit
    def e2e_encode(params, batch):
        ret = retrieve_device(params["t5"]["shared"], batch, k=TOP_K)
        gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, acfg)
        embeds, mask = vt5m.input_embeds(params, vt5_cfg, gen)
        enc = t5m.encode(params["t5"], t5_cfg, embeds, mask)
        return jnp.sum(enc.astype(jnp.float32))

    _sync(e2e_assemble(vt5_params, batch))
    _sync(e2e_encode(vt5_params, batch))
    t_assemble = _time_min(lambda: e2e_assemble(vt5_params, batch), 10)
    t_encode_cum = _time_min(lambda: e2e_encode(vt5_params, batch), 5)
    e2e_assemble_ms = t_assemble * 1e3
    e2e_encode_ms = max(0.0, (t_encode_cum - t_assemble) * 1e3)
    e2e_decode_ms = max(0.0, (e2e_time - t_encode_cum) * 1e3)

    # ---- pipelined e2e: background-thread ingest overlapped with compute -----
    # The production serving loop (engine/evaluate.py, data/prefetch.py)
    # ingests batch N+1 on a host thread while the device answers batch N;
    # this measures that whole loop — host tokenize/pack + transfer + device
    # retrieve->generate — vs the same loop with ingest serialized after each
    # batch. Corpora share make_corpus' fixed words_per_page, so every batch
    # ingests to the caps already compiled above (no recompiles).
    from rag_docvqa_tpu.data.prefetch import map_prefetch

    # 8 batches: at 4 the un-overlapped first batch depressed the pipelined
    # figure ~20% below steady state (PERF.md §5)
    N_PIPE = 8
    corpora = [
        make_corpus(E2E_B, n_pages=E2E_PAGES, words_per_page=120, seed=10 + i)
        for i in range(N_PIPE)
    ]

    from rag_docvqa_tpu.data.transfer import device_put_batch

    def _ingest_put(docs_):
        # int16 token transfer (halves the dominant bytes; widened on device)
        b, _ = ing.ingest(docs_)
        return device_put_batch(b, VOCAB)

    _sync(e2e(vt5_params, _ingest_put(corpora[0])))  # warm shapes
    t0 = time.perf_counter()
    last = None
    for b in map_prefetch(_ingest_put, corpora, depth=2):
        last = e2e(vt5_params, b)
    _sync(last)
    pipe_pages_per_sec = N_PIPE * E2E_B * E2E_PAGES / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for docs_ in corpora:  # serialized: ingest N+1 starts after compute N
        _sync(e2e(vt5_params, _ingest_put(docs_)))
    seq_pages_per_sec = N_PIPE * E2E_B * E2E_PAGES / (time.perf_counter() - t0)

    # free the generator's device state before the remaining sections
    del vt5_params, batch

    # ---- training step throughput (t5-base VT5, fused-layer fwd+bwd, bf16) --
    # The whole step (retrieve -> assemble -> teacher-forced fwd -> backward ->
    # AdamW update) is one jitted program. The encoder trains through the
    # whole-layer kernel pair (fused forward + handwritten Pallas backward,
    # ops/fused_encoder_bwd.py) — measured 445.6 vs 562.6 ms at B=128 against
    # the flash fwd+bwd pair (MFU 0.394 vs 0.312); the backward kernels keep
    # the dLN/dFFN/softmax-bwd glue in VMEM that the XLA backward round-
    # tripped through HBM. f32 master weights, bf16 compute (make_train_step).
    # B=128: the AdamW update's ~14 ms HBM-bound wall amortizes over 4x the
    # compute vs B=32 (0.348 -> 0.394 MFU), and the 16 GB chip fits it.
    from rag_docvqa_tpu.training import TrainState, build_optimizer, make_train_step

    TRAIN_B, TRAIN_TD, TRAIN_REPS = 128, 16, 8
    tr_docs = make_corpus(TRAIN_B, n_pages=E2E_PAGES, words_per_page=120, seed=1)
    tr_batch, tr_aux = ing.ingest(tr_docs)
    tr_batch = jax.device_put(tr_batch)
    tr_labels = jax.device_put(jnp.asarray(ing.answer_labels(tr_aux["answers"], max_len=TRAIN_TD)))
    tr_params = vt5m.init_vt5_params(jax.random.PRNGKey(1), vt5_cfg)  # f32 masters
    tx = build_optimizer(lr=1e-4, warmup_steps=10, total_steps=1000)
    state = TrainState.create(tr_params, tx)
    # remat="layer" is the FALLBACK discipline: the fused-train encoder path
    # (auto-selected inside vt5.forward_train on TPU) recomputes inside its
    # backward kernels and ignores remat; if the gate ever falls back to
    # flash, per-layer jax.checkpoint keeps the step from OOMing at B=128
    # (whole-forward remat stacks every layer's flash residuals; PERF.md §4)
    step_fn = make_train_step(vt5_cfg, rag, tx, bf16_compute=True, remat="layer")
    state, m = step_fn(state, tr_batch, tr_labels)  # compile + warmup
    _sync(m["loss"])

    def train_window():
        nonlocal state
        last = None
        for _ in range(TRAIN_REPS):
            state, last = step_fn(state, tr_batch, tr_labels)
        return last["loss"]

    train_time = _time_min(train_window, 1) / TRAIN_REPS
    # fwd 2*P*T, backward ~2x fwd -> 3x (retrieval/assembly/opt update minor)
    train_flops = 3 * (2 * enc_params * TRAIN_B * 512 + 2 * dec_params * TRAIN_B * TRAIN_TD)
    train_mfu = train_flops / train_time / 197e12 if backend == "tpu" else 0.0
    train_tokens_per_sec = TRAIN_B * 512 / train_time
    del state, tr_params, tr_batch, step_fn

    tokens = jnp.asarray(rng.randint(3, VOCAB, size=(N_CHUNKS, CHUNK_TOKENS)), jnp.int32)
    tok_mask = jnp.asarray(rng.rand(N_CHUNKS, CHUNK_TOKENS) < 0.9)
    q_tokens = jnp.asarray(rng.randint(3, VOCAB, size=(N_QUERIES, QUERY_TOKENS)), jnp.int32)
    q_mask = jnp.ones((N_QUERIES, QUERY_TOKENS), bool)
    # bf16 table + index: halves HBM traffic on the gather-bound embed stage;
    # scores accumulate in f32 inside the kernel (MXU-native mixed precision)
    shared = jnp.asarray(rng.randn(VOCAB, D_MODEL).astype(np.float32)).astype(jnp.bfloat16)

    # ---- TPU-native path -----------------------------------------------------
    n_pad = ((N_CHUNKS + 511) // 512) * 512

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused_pipeline(shared, tokens, tok_mask, q_tokens, q_mask, k):
        index = l2_normalize(mean_pool(shared[tokens], tok_mask).astype(jnp.float32)).astype(jnp.bfloat16)
        index = jnp.pad(index, ((0, n_pad - N_CHUNKS), (0, 0)))
        q = mean_pool(shared[q_tokens], q_mask).astype(jnp.float32)
        vals, idx, valid = cosine_topk_pallas(index, q, jnp.int32(N_CHUNKS), k, tile_n=512)
        return vals

    # compile + warmup
    _sync(fused_pipeline(shared, tokens, tok_mask, q_tokens, q_mask, TOP_K))

    fused_time = _time_min(
        lambda: fused_pipeline(shared, tokens, tok_mask, q_tokens, q_mask, TOP_K), FUSED_REPS
    )
    fused_pages_per_sec = N_PAGES / fused_time

    # ---- reference-structure baseline (same chip, no host-sync penalty) ------
    chunks_per_doc = PAGES_PER_DOC * CHUNKS_PER_PAGE
    doc_tokens = [jnp.asarray(t) for t in np.asarray(tokens).reshape(N_DOCS, chunks_per_doc, CHUNK_TOKENS)[:BASELINE_DOCS]]
    doc_masks = [jnp.asarray(m) for m in np.asarray(tok_mask).reshape(N_DOCS, chunks_per_doc, CHUNK_TOKENS)[:BASELINE_DOCS]]
    q_single = mean_pool(shared[q_tokens], q_mask)

    @jax.jit
    def embed_one(shared, tokens, mask):
        return mean_pool(shared[tokens], mask)

    @functools.partial(jax.jit, static_argnames=("k",))
    def score_one(emb, q, k):
        # reference math, unfused: normalize per query + separate top-k
        # (src/_modules.py:1990-1993 + torch.topk :2014-2016)
        sims = (emb @ q) / (jnp.linalg.norm(emb, axis=-1) * jnp.linalg.norm(q) + 1e-8)
        return jax.lax.top_k(sims, k)

    _sync(score_one(embed_one(shared, doc_tokens[0], doc_masks[0]), q_single[0], TOP_K)[0])

    def baseline_sweep():
        last = None
        for d in range(BASELINE_DOCS):
            e = embed_one(shared, doc_tokens[d], doc_masks[d])
            last, _ = score_one(e, q_single[d % N_QUERIES], TOP_K)
        return last

    # windows=6: the per-doc dispatch loop has ~128 tunnel round-trips per
    # window, so its best-of needs more draws than the single-dispatch
    # metrics to shed tunnel stalls (observed 1.2k-5.2k pages/s across runs
    # at windows=3)
    base_time_per_doc = _time_min(baseline_sweep, 1, windows=6) / BASELINE_DOCS
    base_pages_per_sec = PAGES_PER_DOC / base_time_per_doc

    # ---- host ingest throughput (the host-side bottleneck for index builds) --
    from rag_docvqa_tpu.data.contract import Caps

    _tok = HashTokenizer(vocab_size=VOCAB)
    _ing = DocVQAIngestor(_tok, ChunkSpec(chunk_size=60, overlap=10),
                          Caps(max_pages=8, max_chunks=32, max_slots=2048))
    _docs = make_corpus(64, n_pages=8, words_per_page=120, seed=0)
    _ing.ingest(_docs[:8])  # warm tokenizer + word-matrix caches
    # Per-8-doc-batch MINIMA across 8 windows, then sum: the ingest shares
    # its one core with the round driver, whose periodic work stalls single
    # cells. Best-of-3 over WHOLE 64-doc sweeps needed one clean 90 ms run
    # and recorded 5.6k pages/s in the r4 artifact while the same code
    # measured 7.2-7.4k offline; a per-cell minimum only needs each cell to
    # be clean in ONE of the 8 windows, which reconciles the artifact with
    # the offline number instead of narrating around it.
    _docs_batches = [_docs[s : s + 8] for s in range(0, 64, 8)]
    _cell_best = [float("inf")] * len(_docs_batches)
    for _ in range(8):
        for i, db in enumerate(_docs_batches):
            t0 = time.perf_counter()
            _ing.ingest(db)
            _cell_best[i] = min(_cell_best[i], time.perf_counter() - t0)
    ingest_pages_per_sec = 64 * 8 / sum(_cell_best)

    # multi-process sharded ingest (data/ingest_mp.py): on this image's
    # 1-core host the workers contend with the parent, so this measures ~1x
    # by construction — the number exists to catch regressions in the MP
    # path and to scale on real multi-core hosts (cpu_count-1 workers)
    import os as _os

    from rag_docvqa_tpu.data.ingest_mp import MPIngestor

    with MPIngestor(HashTokenizer(vocab_size=VOCAB), ChunkSpec(chunk_size=60, overlap=10),
                    Caps(max_pages=8, max_chunks=32, max_slots=2048)) as _mp_ing:
        _mp_workers = _mp_ing.num_workers
        list(_mp_ing.imap([_docs[:8]]))  # spawn + warm workers
        t0 = time.perf_counter()
        for _ in _mp_ing.imap([_docs[s : s + 8] for s in range(0, 64, 8)]):
            pass
        ingest_mp_pages_per_sec = 64 * 8 / (time.perf_counter() - t0)

    # ---- BGE-transformer embed backend (not a table lookup) ------------------
    # bge-small-en-v1.5-shaped encoder over the same chunk corpus: proves the
    # embed+index throughput claim holds with a real 12-layer transformer
    # (reference BiEncoder BGE backend, src/_modules.py:1438-1442).
    from rag_docvqa_tpu.models.bert import BertConfig, bert_sentence_embed, init_bert_params

    bge_cfg = BertConfig(vocab_size=VOCAB, hidden_size=384, num_layers=12, num_heads=12,
                         intermediate_size=1536)
    bge_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_bert_params(jax.random.PRNGKey(0), bge_cfg),
    )

    BGE_BATCH = 1024

    @jax.jit
    def bge_embed_all(params, tokens, mask):
        def body(carry, xs):
            t, m = xs
            return carry, bert_sentence_embed(params, bge_cfg, t, m)

        ts = tokens.reshape(-1, BGE_BATCH, CHUNK_TOKENS)
        ms = mask.reshape(-1, BGE_BATCH, CHUNK_TOKENS)
        _, embs = jax.lax.scan(body, 0, (ts, ms))
        return embs.reshape(-1, 384)

    @functools.partial(jax.jit, static_argnames=("k",))
    def bge_pipeline(params, tokens, mask, q_tokens, q_mask, k):
        index = bge_embed_all(params, tokens, mask).astype(jnp.bfloat16)
        index = jnp.pad(index, ((0, n_pad - N_CHUNKS), (0, 0)))
        q = bert_sentence_embed(params, bge_cfg, q_tokens, q_mask).astype(jnp.float32)
        vals, idx, valid = cosine_topk_auto(index, q, jnp.int32(N_CHUNKS), k, tile_n=512)
        return vals

    _sync(bge_pipeline(bge_params, tokens, tok_mask, q_tokens, q_mask, TOP_K))
    bge_time = _time_min(
        lambda: bge_pipeline(bge_params, tokens, tok_mask, q_tokens, q_mask, TOP_K), 5
    )
    bge_pages_per_sec = N_PAGES / bge_time
    # analytic transformer flops: ~2 * params * tokens (attn score terms minor at T=64)
    bge_n_params = 12 * (4 * 384 * 384 + 2 * 384 * 1536)
    bge_flops = 2 * bge_n_params * (N_CHUNKS * CHUNK_TOKENS + N_QUERIES * QUERY_TOKENS)
    bge_mfu = bge_flops / bge_time / 197e12 if backend == "tpu" else 0.0  # v5e bf16 peak (197 TFLOPs)

    # ---- contrastive embedder fine-tune step (train_cl's MNRL step) ----------
    # The reference's retriever fine-tune (train_CL_embs.py:15-50): in-batch
    # InfoNCE over BGE-small sentence embeddings, B=256 pairs at T=64. Round 4
    # measured 0.14 MFU through the XLA backward; the step now routes through
    # the handwritten BERT whole-layer backward kernels
    # (ops/fused_encoder_bwd.py, auto-selected by bert_encode when they fit)
    # with bf16 compute + f32 masters.
    import optax as _optax

    from rag_docvqa_tpu.models import bert as bertm
    from rag_docvqa_tpu.training.contrastive import multiple_negatives_ranking_loss

    CL_B, CL_T, CL_REPS = 256, 64, 4
    cl_cfg = bertm.BertConfig()  # bge-small dims
    cl_params = bertm.init_bert_params(jax.random.PRNGKey(5), cl_cfg)
    cl_tx = _optax.adamw(2e-5)
    cl_opt = cl_tx.init(cl_params)
    cl_a_ids = jnp.asarray(rng.randint(3, cl_cfg.vocab_size, size=(CL_B, CL_T)), jnp.int32)
    cl_p_ids = jnp.asarray(rng.randint(3, cl_cfg.vocab_size, size=(CL_B, CL_T)), jnp.int32)
    cl_mask = jnp.ones((CL_B, CL_T), bool)

    @jax.jit
    def cl_step(params, opt_state, a_ids, a_mask, p_ids, p_mask):
        def loss_fn(p):
            p = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, p)
            a = bertm.bert_sentence_embed(p, cl_cfg, a_ids, a_mask).astype(jnp.float32)
            b = bertm.bert_sentence_embed(p, cl_cfg, p_ids, p_mask).astype(jnp.float32)
            return multiple_negatives_ranking_loss(a, b)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = cl_tx.update(grads, opt_state, params)
        return _optax.apply_updates(params, updates), opt_state, loss

    cl_params, cl_opt, cl_loss = cl_step(cl_params, cl_opt, cl_a_ids, cl_mask,
                                         cl_p_ids, cl_mask)
    _sync(cl_loss)

    def cl_window():
        nonlocal cl_params, cl_opt
        last = None
        for _ in range(CL_REPS):
            cl_params, cl_opt, last = cl_step(cl_params, cl_opt, cl_a_ids, cl_mask,
                                              cl_p_ids, cl_mask)
        return last

    cl_time = _time_min(cl_window, 1) / CL_REPS
    cl_tokens = 2 * CL_B * CL_T  # anchors + positives per step
    cl_flops = 3 * 2 * bge_n_params * cl_tokens
    cl_mfu = cl_flops / cl_time / 197e12 if backend == "tpu" else 0.0
    del cl_params, cl_opt

    # ---- HiVT5 e2e: hierarchical encode -> page head -> compressed decode ----
    # pages-in-batch encode (B*P rows of [PAGE]x10 + 512 text tokens through
    # the t5-base encoder), keep 10 summary tokens/page, decode over the
    # 80-token compressed document (reference HiVT5.py:46-123). Text-only
    # (use_visual=False): the visual branch is benched via its fused ViT
    # kernel in PERF.md §2; page renders would time the host resize here.
    from rag_docvqa_tpu.engine.hivt5_engine import _generate_device as hivt5_generate
    from rag_docvqa_tpu.models import hivt5 as hm

    HI_B, HI_P, HI_NEW = 16, 8, 16
    hi_cfg = hm.HiVT5Config(
        t5=t5_cfg, spatial=SpatialConfig(hidden_size=768, dropout_rate=0.0),
        max_doc_pages=HI_P, page_tokens=10, page_seq_len=512,
    )
    hi_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        hm.init_hivt5_params(jax.random.PRNGKey(2), hi_cfg),
    )
    hi_batch = jax.device_put(ing.ingest(docs[:HI_B])[0])
    _sync(hivt5_generate(hi_params, hi_cfg, hi_batch, HI_NEW)[1])
    hi_time = _time_min(lambda: hivt5_generate(hi_params, hi_cfg, hi_batch, HI_NEW)[1], 5)
    hi_tokens = HI_B * HI_P * (hi_cfg.page_tokens + hi_cfg.page_seq_len)
    hi_flops = 2 * enc_params * hi_tokens + 2 * dec_params * HI_B * HI_NEW
    hivt5_mfu = hi_flops / hi_time / 197e12 if backend == "tpu" else 0.0
    hivt5_docs_per_sec = HI_B / hi_time
    del hi_params, hi_batch

    # ---- HiVT5 training step: LM CE + page-retrieval CE ---------------------
    # Pages-in-batch encode (B*P = 128 rows of 512 tokens — the same token
    # budget as the VT5 train row) through the fused whole-layer forward +
    # handwritten Pallas backward (forward_train fused="train"); decoder
    # trains over the 80-token compressed document, so the step should
    # approach the VT5 path's 0.40 MFU. Reference trains Hi-VT5 as a
    # first-class config (train.py:143-192 + ret_loss at :69).
    from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

    HI_TR_B, HI_TR_TD, HI_TR_REPS = 16, 16, 4
    hi_tr_params = hm.init_hivt5_params(jax.random.PRNGKey(4), hi_cfg)  # f32 masters
    hi_tr_docs = make_corpus(HI_TR_B, n_pages=HI_P, words_per_page=120, seed=5)
    hi_tr_batch, hi_tr_aux = ing.ingest(hi_tr_docs)
    hi_tr_batch = jax.device_put(hi_tr_batch)
    hi_tr_labels = jax.device_put(
        jnp.asarray(ing.answer_labels(hi_tr_aux["answers"], max_len=HI_TR_TD)))
    hi_tx = build_optimizer(lr=1e-4, warmup_steps=10, total_steps=1000)
    hi_state = TrainState.create(hi_tr_params, hi_tx)
    hi_step_fn = make_hivt5_train_step(hi_cfg, hi_tx, remat="layer", bf16_compute=True)
    hi_state, hi_m = hi_step_fn(hi_state, hi_tr_batch, hi_tr_labels)  # compile
    _sync(hi_m["loss"])

    def hivt5_train_window():
        nonlocal hi_state
        last = None
        for _ in range(HI_TR_REPS):
            hi_state, last = hi_step_fn(hi_state, hi_tr_batch, hi_tr_labels)
        return last["loss"]

    hivt5_train_time = _time_min(hivt5_train_window, 1) / HI_TR_REPS
    hi_tr_tokens = HI_TR_B * HI_P * (hi_cfg.page_tokens + hi_cfg.page_seq_len)
    hivt5_train_flops = 3 * (2 * enc_params * hi_tr_tokens
                             + 2 * dec_params * HI_TR_B * HI_TR_TD)
    hivt5_train_mfu = hivt5_train_flops / hivt5_train_time / 197e12 if backend == "tpu" else 0.0
    hivt5_train_tokens_per_sec = hi_tr_tokens / hivt5_train_time
    del hi_state, hi_tr_params, hi_tr_batch, hi_step_fn

    # ---- RAGPix2Struct e2e: page strips -> patch MaxSim -> generate ----------
    # The full OCR-free engine loop (reference RAGPix2Struct.py:183-334),
    # round-5 serving treatment:
    #   * cold: per-batch host chunk+extract (the r4-comparable number);
    #   * cropmerge: the per-QUERY loop over a prepared corpus (chunk+extract
    #     done once at ingest) — retrieve + crop-merge + pack + generate per
    #     query with the reference's crop-merge packing semantics;
    #   * stream: inference_stream — batches pipelined, prepare on a prefetch
    #     thread, generate fetched one batch late (1-core host: threads can't
    #     create CPU capacity, so this bounds at total host work);
    #   * e2e (the headline, like the VT5 headline queries its resident
    #     index): VisualIndex path — patch embeddings AND patch pixels
    #     device-resident, generator input packed by on-device gathers; the
    #     only per-query host work is the question render.
    # Decode runs with int8 cross-KV (the VT5 treatment) and the generate
    # probe reports the serving batch B=32, where the per-step weight re-read
    # amortizes (B=8 kept for r4 comparability).
    from dataclasses import replace as _dcreplace

    from rag_docvqa_tpu.engine.rag_pix2struct import (
        P2SRAGConfig, RAGPix2StructEngine, _generate_device as p2s_generate)
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.data.contract import RawDocument

    P2S_B, P2S_PAGES, P2S_NEW, P2S_B2 = 8, 4, 16, 32
    p2s_cfg = p2s.Pix2StructConfig()  # pix2struct-base dims
    p2s_cfg = _dcreplace(p2s_cfg, text=_dcreplace(p2s_cfg.text, decode_kv_int8=True))
    p2s_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        p2s.init_p2s_params(jax.random.PRNGKey(3), p2s_cfg),
    )
    p2s_rag = P2SRAGConfig(chunk_num=TOP_K, max_new_tokens=P2S_NEW)
    p2s_eng = RAGPix2StructEngine(p2s_rag, p2s_cfg, p2s_params, tok)
    img_rng = np.random.RandomState(7)

    def _mk_p2s_docs(n):
        return [
            RawDocument(
                question=f"what is item {i}?", words=[[]], boxes=[[]], answers=["x"],
                images=[img_rng.randint(0, 255, (512, 512, 3), np.uint8)
                        for _ in range(P2S_PAGES)],
            )
            for i in range(n)
        ]

    p2s_docs = _mk_p2s_docs(P2S_B)
    p2s_eng.inference(p2s_docs)  # compile + warm
    p2s_cold_time = _time_min(lambda: jnp.float32(p2s_eng.inference(p2s_docs)["confidences"][0]), 1)
    p2s_cold_pages_per_sec = P2S_B * P2S_PAGES / p2s_cold_time

    # per-query loop over a prepared corpus (prepare amortized at ingest)
    p2s_imgs = [[np.asarray(im) for im in d.images] for d in p2s_docs]
    p2s_prep = p2s_eng.prepare_docs(p2s_imgs)
    p2s_eng.inference(p2s_docs, prepared=p2s_prep)  # warm
    p2s_time = _time_min(
        lambda: jnp.float32(p2s_eng.inference(p2s_docs, prepared=p2s_prep)["confidences"][0]), 3)
    p2s_pages_per_sec = P2S_B * P2S_PAGES / p2s_time

    # pipelined streaming incl. prepare (4 fresh batches through the thread)
    p2s_stream_batches = [_mk_p2s_docs(P2S_B) for _ in range(4)]
    list(p2s_eng.inference_stream(iter(p2s_stream_batches[:1])))  # warm path
    t0 = time.perf_counter()
    for out in p2s_eng.inference_stream(iter(p2s_stream_batches)):
        pass
    p2s_stream_pages_per_sec = 4 * P2S_B * P2S_PAGES / (time.perf_counter() - t0)

    # device-resident visual index: B2 queries over B2 prepared docs
    p2s_docs2 = _mk_p2s_docs(P2S_B2)
    p2s_prep2 = p2s_eng.prepare_docs([[np.asarray(im) for im in d.images] for d in p2s_docs2])
    p2s_index = p2s_eng.build_visual_index(p2s_prep2)
    p2s_questions = [d.question for d in p2s_docs2]
    p2s_ids = list(range(P2S_B2))
    p2s_eng.inference_indexed(p2s_questions, p2s_ids, p2s_index)  # warm
    p2s_idx_time = _time_min(
        lambda: jnp.float32(p2s_eng.inference_indexed(
            p2s_questions, p2s_ids, p2s_index)["confidences"][0]), 3)
    p2s_indexed_pages_per_sec = P2S_B2 * P2S_PAGES / p2s_idx_time
    del p2s_index, p2s_prep2

    # device generate alone at the packed patch budget (B=8 r4-comparable,
    # B=32 serving batch -> headline MFU)
    v = p2s_cfg.vision
    p2s_v_params = v.num_layers * (4 * v.hidden_size * v.hidden_size + 2 * v.hidden_size * v.d_ff)
    t = p2s_cfg.text
    p2s_d_params = t.num_decoder_layers * (8 * t.d_model * t.d_kv * t.num_heads + 3 * t.d_model * t.d_ff) \
        + t.d_model * t.vocab_size

    def _p2s_gen_probe(bsz):
        gp = jnp.zeros((bsz, p2s_rag.max_total_patches, 2 + p2s_cfg.vision.patch_dim), jnp.float32)
        gm = jnp.ones((bsz, p2s_rag.max_total_patches), bool)
        _sync(p2s_generate(p2s_params, p2s_cfg, gp, gm, P2S_NEW)[1])
        gen_time = _time_min(lambda: p2s_generate(p2s_params, p2s_cfg, gp, gm, P2S_NEW)[1], 5)
        flops = 2 * p2s_v_params * bsz * p2s_rag.max_total_patches \
            + 2 * p2s_d_params * bsz * P2S_NEW
        return gen_time, (flops / gen_time / 197e12 if backend == "tpu" else 0.0)

    p2s_gen_time, p2s_gen_mfu_b8 = _p2s_gen_probe(P2S_B)
    p2s_gen_time_b32, p2s_gen_mfu = _p2s_gen_probe(P2S_B2)
    del p2s_params, p2s_eng, p2s_docs, p2s_docs2, p2s_prep

    # ---- Qwen decode path: flash prefill + cached greedy decode --------------
    # Qwen2.5-3B dims (the reference's QwenVL generator family,
    # QwenVLInstruct.py:234-264): GQA 16q/2kv, tied embeddings. Weights init
    # directly in bf16 under one jit (a separate f32 init + cast would peak
    # at 3x the weight bytes). Decode is HBM-bound: every step re-reads the
    # ~6.2 GB of weights, so ms/step is reported against that floor.
    from rag_docvqa_tpu.models import causal_lm as clm

    QW_B, QW_TP, QW_NEW = 8, 512, 64
    q_cfg = clm.CausalLMConfig(
        vocab_size=151936, d_model=2048, num_layers=36, num_heads=16,
        num_kv_heads=2, d_ff=11008, flash_prefill=backend == "tpu",
    )
    q_params = jax.jit(
        lambda k: jax.tree.map(lambda x: x.astype(jnp.bfloat16), clm.init_causal_lm_params(k, q_cfg))
    )(jax.random.PRNGKey(4))
    q_ids = jnp.asarray(rng.randint(3, 151000, size=(QW_B, QW_TP)), jnp.int32)
    q_am = jnp.ones((QW_B, QW_TP), bool)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def qwen_gen(params, cfg, ids, am):
        return clm.generate(params, cfg, ids, am, max_new_tokens=QW_NEW)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def qwen_prefill_probe(params, cfg, ids, am):
        logits0, _ = clm.prefill(params, cfg, ids, am, QW_TP + QW_NEW)
        return jnp.sum(logits0.astype(jnp.float32))

    _sync(qwen_gen(q_params, q_cfg, q_ids, q_am)[1])
    _sync(qwen_prefill_probe(q_params, q_cfg, q_ids, q_am))
    qwen_gen_time = _time_min(lambda: qwen_gen(q_params, q_cfg, q_ids, q_am)[1], 3)
    qwen_prefill_time = _time_min(lambda: qwen_prefill_probe(q_params, q_cfg, q_ids, q_am), 3)
    qwen_decode_step_ms = (qwen_gen_time - qwen_prefill_time) / (QW_NEW - 1) * 1e3
    qwen_decode_tokens_per_sec = QW_B * 1e3 / max(qwen_decode_step_ms, 1e-9)
    q_bytes = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(q_params)) * 2
    # effective GB/s of the per-step weight re-read; compare against the
    # MEASURED ~230-280 GB/s this tunneled chip delivers (PERF.md §6), not
    # the 819 GB/s datasheet
    qwen_decode_gbs = q_bytes / (qwen_decode_step_ms / 1e3) / 1e9
    qwen_prefill_tokens_per_sec = QW_B * QW_TP / qwen_prefill_time
    # batch scaling: the per-step weight re-read amortizes over the batch —
    # B=32's KV cache (~680 MB at Tp=512) still fits beside the 6.2 GB of
    # weights, so serving throughput scales ~linearly until the cache read
    # rivals the weight read
    QW_B2 = 32
    q_ids2 = jnp.asarray(rng.randint(3, 151000, size=(QW_B2, QW_TP)), jnp.int32)
    q_am2 = jnp.ones((QW_B2, QW_TP), bool)
    _sync(qwen_gen(q_params, q_cfg, q_ids2, q_am2)[1])
    _sync(qwen_prefill_probe(q_params, q_cfg, q_ids2, q_am2))
    qwen_gen_time2 = _time_min(lambda: qwen_gen(q_params, q_cfg, q_ids2, q_am2)[1], 3)
    qwen_prefill_time2 = _time_min(lambda: qwen_prefill_probe(q_params, q_cfg, q_ids2, q_am2), 3)
    qwen_decode_step_ms_b32 = (qwen_gen_time2 - qwen_prefill_time2) / (QW_NEW - 1) * 1e3
    qwen_decode_tokens_per_sec_b32 = QW_B2 * 1e3 / max(qwen_decode_step_ms_b32, 1e-9)

    # int8 weight streaming: the decode step IS the weight re-read (~6.2 GB
    # bf16/step), so W8 halves the bytes IF this chip's int8 read rate holds
    # through the scan-pipelined weight stream. The probe kernels measured
    # int8 at HALF the bf16 byte rate (PERF.md §6) while the Qwen stream
    # measured ~626 GB/s effective — this answers which regime the decode
    # sits in. Measured at B=8 against the 9.9 ms/step bf16 row.
    q_params8 = jax.jit(clm.quantize_weights_int8)(q_params)
    _sync(qwen_gen(q_params8, q_cfg, q_ids, q_am)[1])
    _sync(qwen_prefill_probe(q_params8, q_cfg, q_ids, q_am))
    qwen_gen_time8 = _time_min(lambda: qwen_gen(q_params8, q_cfg, q_ids, q_am)[1], 3)
    qwen_prefill_time8 = _time_min(lambda: qwen_prefill_probe(q_params8, q_cfg, q_ids, q_am), 3)
    qwen_decode_step_ms_int8w = (qwen_gen_time8 - qwen_prefill_time8) / (QW_NEW - 1) * 1e3
    del q_params8, q_ids2, q_am2

    # ---- Qwen e2e: retrieve -> ChatML assemble -> GQA prefill -> decode ------
    # The full RAGQwenEngine loop (reference QwenVLInstruct.py:234-264 +
    # RAGVT5.py:72-82): device chunk retrieval over the LM's own embedding
    # table, host ChatML prompt assembly from the retrieved chunk texts,
    # flash GQA prefill, cached greedy decode, answer strip. Model is the
    # 3B-dims PROXY (16 GB HBM forces it; the reference ships 7B).
    from rag_docvqa_tpu.data.contract import Caps as _Caps
    from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine

    QW_E2E_B, QW_E2E_PAGES = 8, 8
    qw_tok = HashTokenizer(vocab_size=151936)
    qw_ing = DocVQAIngestor(qw_tok, ChunkSpec(chunk_size=60, overlap=10),
                            _Caps(max_pages=QW_E2E_PAGES, max_chunks=32, max_slots=2048))
    qw_docs = make_corpus(QW_E2E_B, n_pages=QW_E2E_PAGES, words_per_page=120, seed=9)
    qw_batch, qw_aux = qw_ing.ingest(qw_docs)
    qw_batch = jax.device_put(qw_batch)
    qw_eng = RAGQwenEngine(QwenRAGConfig(), q_cfg, q_params, qw_tok)
    qw_eng.inference(qw_batch, qw_aux)  # compile + warm
    qwen_e2e_time = _time_min(
        lambda: jnp.float32(qw_eng.inference(qw_batch, qw_aux)["confidences"][0]), 2)
    qwen_e2e_docs_per_sec = QW_E2E_B / qwen_e2e_time
    del q_params, q_ids, q_am, qw_eng, qw_batch

    # ---- Qwen 7B int8: REFERENCE-scale serving on one 16 GB chip -------------
    # The reference ships Qwen2.5-VL-7B (eval.py:459); its bf16 weights are
    # 15.2 GB and cannot fit a v5e, which is why the rows above use a 3B-dims
    # proxy. W8 weights (~7.7 GB) DO fit — init_causal_lm_params_int8 draws
    # and quantizes one layer slice at a time (a full-precision init would
    # peak at 2.3x the 16 GB pool), and the decode step streams int8 bytes
    # with the per-channel scales folded outside the dots. This serves the
    # reference's actual model size on one chip; the step's effective weight
    # read rate is reported against the int8 byte count.
    Q7_B = 8
    q7_cfg = clm.CausalLMConfig(
        vocab_size=152064, d_model=3584, num_layers=28, num_heads=28,
        num_kv_heads=4, d_ff=18944, tie_word_embeddings=False,
        flash_prefill=backend == "tpu",
    )
    q7_params = jax.jit(functools.partial(clm.init_causal_lm_params_int8, cfg=q7_cfg))(
        jax.random.PRNGKey(7))
    q7_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(q7_params))
    q7_ids = jnp.asarray(rng.randint(3, 152000, size=(Q7_B, QW_TP)), jnp.int32)
    q7_am = jnp.ones((Q7_B, QW_TP), bool)
    _sync(qwen_gen(q7_params, q7_cfg, q7_ids, q7_am)[1])
    _sync(qwen_prefill_probe(q7_params, q7_cfg, q7_ids, q7_am))
    q7_gen_time = _time_min(lambda: qwen_gen(q7_params, q7_cfg, q7_ids, q7_am)[1], 2)
    q7_prefill_time = _time_min(lambda: qwen_prefill_probe(q7_params, q7_cfg, q7_ids, q7_am), 2)
    q7_decode_step_ms = (q7_gen_time - q7_prefill_time) / (QW_NEW - 1) * 1e3
    q7_decode_tokens_per_sec = Q7_B * 1e3 / max(q7_decode_step_ms, 1e-9)
    q7_weight_read_gbs = q7_bytes / (q7_decode_step_ms / 1e3) / 1e9
    q7_prefill_tokens_per_sec = Q7_B * QW_TP / q7_prefill_time
    del q7_params, q7_ids, q7_am

    # ---- corpus-scale query throughput (HBM-resident big index) --------------
    # LAST on purpose: the ~2.7 GB allocation peak (bf16 + f32 temp + int8)
    # fragments the tunneled chip's pool; running the generator e2e afterwards
    # in the same process measured 1.9 s/batch (vs 350 ms in a clean pool) —
    # the decode's 2.4 GB contiguous cross-KV ends up paging.
    BIG_N = 524_288  # 512k chunks = 262k pages resident in HBM (bf16: 768MB)
    big_host = rng.randn(BIG_N, D_MODEL).astype(np.float32)
    big_index = jnp.asarray(big_host).astype(jnp.bfloat16)
    big_index = big_index / jnp.linalg.norm(big_index.astype(jnp.float32), axis=-1, keepdims=True).astype(jnp.bfloat16)
    # host f32 PRE-NORMALIZED copy of the rows for the refined-int4 rescore
    # tier (the builder always has these — precompute.py writes them to the
    # npz). f32 over f16: the f16 gather's astype costs 25 ms/batch vs the
    # 6.8 ms f32 gather (ops/quant.py::normalize_host_rows)
    big_host /= np.linalg.norm(big_host, axis=1, keepdims=True)
    host_rows_np = big_host
    del big_host

    @functools.partial(jax.jit, static_argnames=("k",))
    def big_query(index, q, k):
        # auto-select running-merge Pallas (tiny batch) vs two-phase Pallas;
        # (vals, idx) so the int4 agreement check reuses this sweep
        vals, idx, _ = cosine_topk_auto(index, q, jnp.int32(BIG_N), k, tile_n=2048)
        return vals, idx

    qv = mean_pool(shared[q_tokens], q_mask).astype(jnp.float32)
    _sync(big_query(big_index, qv, TOP_K)[0])
    big_time = _time_min(lambda: big_query(big_index, qv, TOP_K)[0], 10)
    big_qps = N_QUERIES / big_time

    # throughput-optimal batch: the same 805 MB index read amortizes over 4x
    # the queries (PERF.md §6 — the kernel is read-bound at ~230 GB/s
    # effective on this chip, so bigger query batches raise QPS ~25%)
    qv1k = jnp.tile(qv, (4, 1))
    _sync(big_query(big_index, qv1k, TOP_K)[0])
    big_qps_b1024 = 4 * N_QUERIES / _time_min(lambda: big_query(big_index, qv1k, TOP_K)[0], 5)

    # int8-quantized index: 4x corpus capacity per chip (ops/quant.py)
    from rag_docvqa_tpu.ops.quant import cosine_topk_int8_auto, quantize_rows

    iq, iscale = jax.jit(quantize_rows)(big_index.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def big_query_int8(iq, iscale, q, k):
        return cosine_topk_int8_auto(iq, iscale, q, jnp.int32(BIG_N), k)[0]

    _sync(big_query_int8(iq, iscale, qv, TOP_K))
    int8_qps = N_QUERIES / _time_min(lambda: big_query_int8(iq, iscale, qv, TOP_K), 10)

    # int4-packed index: 8x capacity (ops/quant.py; nibble pairs unpack
    # in-kernel). The capacity extreme — top-10 agreement vs the bf16 exact
    # retrieval is reported next to it (worst-case random data; real
    # corpora cluster and agree better)
    from rag_docvqa_tpu.ops.quant import cosine_topk_int4_auto, quantize_rows_int4

    ip4, is4 = jax.jit(lambda ix: quantize_rows_int4(ix.astype(jnp.float32)))(big_index)

    @functools.partial(jax.jit, static_argnames=("k",))
    def big_query_int4(ip, isc, q, k):
        return cosine_topk_int4_auto(ip, isc, q, jnp.int32(BIG_N), k)

    _, i4_idx, _ = big_query_int4(ip4, is4, qv, TOP_K)
    ibf_idx = big_query(big_index, qv, TOP_K)[1]  # reuse the exact sweep
    i4_idx, ibf_idx = np.asarray(i4_idx), np.asarray(ibf_idx)
    int4_agree = float(np.mean([
        len(set(i4_idx[b]) & set(ibf_idx[b])) / TOP_K for b in range(N_QUERIES)
    ]))
    int4_qps = N_QUERIES / _time_min(lambda: big_query_int4(ip4, is4, qv, TOP_K)[0], 10)

    # refined int4: device exact-int4 shortlist (k'=48) + host f16 rescore
    # (ops/quant.py refined block). Pure int4 ordering plateaus ~0.78 on
    # worst-case random data (information bound — PERF.md §1); the true
    # top-10 sits inside the int4 top-48 with ~0.998 recall, so rescoring
    # those 48 rows per query in full precision buys near-exact agreement.
    # The pipelined driver dispatches batch i+1's device shortlist before
    # host-rescoring batch i, so throughput is max(device, host).
    from rag_docvqa_tpu.ops.quant import _rescore_host, refined_query_batches

    KPRIME = 48
    qv_np = np.asarray(qv)
    _, s_idx, s_ok = big_query_int4(ip4, is4, qv, KPRIME)
    _, ref_idx, _ = _rescore_host(np.asarray(s_idx), np.asarray(s_ok),
                                  qv_np, host_rows_np, TOP_K,
                                  rows_normalized=True)
    int4_ref_agree = float(np.mean([
        len(set(ref_idx[b]) & set(ibf_idx[b])) / TOP_K for b in range(N_QUERIES)
    ]))

    REF_BATCHES = 8

    def _run_refined():
        last = None
        for out in refined_query_batches(
                ip4, is4, [(qv, qv_np)] * REF_BATCHES, jnp.int32(BIG_N), TOP_K,
                host_rows=host_rows_np, kprime=KPRIME,
                rows_normalized=True):
            last = out
        return last[0][0, 0]

    _run_refined()  # warm the k'=48 shortlist program
    int4_ref_time = _time_min(_run_refined, 2) / REF_BATCHES
    int4_ref_qps = N_QUERIES / int4_ref_time
    del ip4, is4, iq, iscale, big_index, qv1k, host_rows_np

    # ---- int8 capacity at scale: 2M-chunk index --------------------------------
    # The 4x-capacity claim, exercised end-to-end: 2M chunks x 768 = 1.6 GB
    # int8 (6.3 GB f32-equivalent corpus). Built in on-device slices (one
    # 2M x 768 f32 intermediate would transiently eat 6.3 GB); the bf16 twin
    # (3.2 GB) exists only long enough to measure exact-vs-int8 top-10
    # agreement, then frees before the int8 timing so the pool is clean.
    from rag_docvqa_tpu.ops.quant import quantize_rows as _qrows

    BIG2, SLICES = 2_097_152, 8
    _q8, _sc, _bf = [], [], []
    qslice = jax.jit(lambda x: _qrows(l2_normalize(x.astype(jnp.float32))))
    for i in range(SLICES):
        x = jax.random.normal(jax.random.PRNGKey(100 + i), (BIG2 // SLICES, D_MODEL), jnp.bfloat16)
        s8, ss = qslice(x)
        _q8.append(s8)
        _sc.append(ss)
        _bf.append(jax.jit(lambda v: l2_normalize(v.astype(jnp.float32)).astype(jnp.bfloat16))(x))
        del x
    iq2 = jnp.concatenate(_q8); isc2 = jnp.concatenate(_sc); bf2 = jnp.concatenate(_bf)
    del _q8, _sc, _bf

    @functools.partial(jax.jit, static_argnames=("k",))
    def big2_query_bf16(index, q, k):
        return cosine_topk_auto(index, q, jnp.int32(BIG2), k, tile_n=2048)

    @functools.partial(jax.jit, static_argnames=("k",))
    def big2_query_int8(iq, isc, q, k):
        return cosine_topk_int8_auto(iq, isc, q, jnp.int32(BIG2), k)

    _, exact_idx, _ = big2_query_bf16(bf2, qv, TOP_K)
    _, i8_idx, _ = big2_query_int8(iq2, isc2, qv, TOP_K)
    exact_idx, i8_idx = np.asarray(exact_idx), np.asarray(i8_idx)
    int8_2m_agree = float(np.mean([
        len(set(exact_idx[b]) & set(i8_idx[b])) / TOP_K for b in range(N_QUERIES)
    ]))
    _sync(big2_query_bf16(bf2, qv, TOP_K)[0])
    bf16_2m_qps = N_QUERIES / _time_min(lambda: big2_query_bf16(bf2, qv, TOP_K)[0], 5)
    del bf2  # free the 3.2 GB twin before timing int8 in a clean pool
    _sync(big2_query_int8(iq2, isc2, qv, TOP_K)[0])
    int8_2m_time = _time_min(lambda: big2_query_int8(iq2, isc2, qv, TOP_K)[0], 5)
    int8_2m_qps = N_QUERIES / int8_2m_time
    del iq2, isc2

    # the chip can enter a degraded window MID-run; a closing probe makes
    # that visible (start healthy + end degraded => later sections tainted)
    health_end_tflops, dispatch_end_ms = (
        _device_health_tflops() if backend == "tpu" else (0.0, 0.0))

    print(
        json.dumps(
            {
                "metric": "embed_retrieve_pages_per_sec_per_chip",
                "value": round(fused_pages_per_sec, 1),
                "unit": "pages/s/chip",
                "vs_baseline": round(fused_pages_per_sec / base_pages_per_sec, 2),
                "detail": {
                    "backend": backend,
                    "device": str(jax.devices()[0]),
                    "device_health_tflops": round(health_tflops, 1),
                    "device_health_end_tflops": round(health_end_tflops, 1),
                    "device_dispatch_ms": round(dispatch_ms, 1),
                    "device_dispatch_end_ms": round(dispatch_end_ms, 1),
                    "device_health_wait_s": round(health_wait_s, 1),
                    "fused_ms_per_batch": round(fused_time * 1e3, 2),
                    "baseline_pages_per_sec": round(base_pages_per_sec, 1),
                    "n_pages": N_PAGES,
                    "n_chunks": N_CHUNKS,
                    "n_queries": N_QUERIES,
                    "top_k": TOP_K,
                    "big_index_chunks": BIG_N,
                    "big_index_query_qps": round(big_qps, 1),
                    "big_index_query_qps_b1024": round(big_qps_b1024, 1),
                    "big_index_query_ms_per_batch": round(big_time * 1e3, 2),
                    "big_index_int8_query_qps": round(int8_qps, 1),
                    "big_index_int4_query_qps": round(int4_qps, 1),
                    "big_index_int4_top10_agreement": round(int4_agree, 4),
                    "big_index_int4_refined_qps": round(int4_ref_qps, 1),
                    "big_index_int4_refined_ms_per_batch": round(int4_ref_time * 1e3, 2),
                    "big_index_int4_refined_top10_agreement": round(int4_ref_agree, 4),
                    "big_index_int8_2m_chunks": BIG2,
                    "big_index_int8_2m_qps": round(int8_2m_qps, 1),
                    "big_index_int8_2m_ms_per_batch": round(int8_2m_time * 1e3, 2),
                    "big_index_int8_2m_top10_agreement": round(int8_2m_agree, 4),
                    "big_index_bf16_2m_qps": round(bf16_2m_qps, 1),
                    "host_ingest_pages_per_sec": round(ingest_pages_per_sec, 1),
                    "host_ingest_mp_pages_per_sec": round(ingest_mp_pages_per_sec, 1),
                    "host_ingest_mp_workers": _mp_workers,
                    "host_cpu_count": _os.cpu_count(),
                    "hivt5_e2e_docs_per_sec": round(hivt5_docs_per_sec, 1),
                    "hivt5_e2e_pages_per_sec": round(hivt5_docs_per_sec * HI_P, 1),
                    "hivt5_e2e_ms_per_batch": round(hi_time * 1e3, 2),
                    "hivt5_mfu": round(hivt5_mfu, 3),
                    "hivt5_train_step_ms": round(hivt5_train_time * 1e3, 2),
                    "hivt5_train_tokens_per_sec": round(hivt5_train_tokens_per_sec, 1),
                    "hivt5_train_mfu": round(hivt5_train_mfu, 3),
                    "p2s_e2e_docs_per_sec": round(P2S_B2 / p2s_idx_time, 2),
                    "p2s_e2e_pages_per_sec": round(p2s_indexed_pages_per_sec, 1),
                    "p2s_e2e_cropmerge_pages_per_sec": round(p2s_pages_per_sec, 1),
                    "p2s_e2e_cold_pages_per_sec": round(p2s_cold_pages_per_sec, 1),
                    "p2s_stream_incl_prepare_pages_per_sec": round(p2s_stream_pages_per_sec, 1),
                    "p2s_generate_ms_per_batch": round(p2s_gen_time * 1e3, 2),
                    "p2s_generate_mfu_b8": round(p2s_gen_mfu_b8, 3),
                    "p2s_generate_ms_per_batch_b32": round(p2s_gen_time_b32 * 1e3, 2),
                    "p2s_generate_mfu": round(p2s_gen_mfu, 3),
                    "qwen_decode_tokens_per_sec": round(qwen_decode_tokens_per_sec, 1),
                    "qwen_decode_ms_per_step": round(qwen_decode_step_ms, 2),
                    "qwen_decode_weight_read_gbs": round(qwen_decode_gbs, 1),
                    "qwen_prefill_tokens_per_sec": round(qwen_prefill_tokens_per_sec, 1),
                    "qwen_decode_tokens_per_sec_b32": round(qwen_decode_tokens_per_sec_b32, 1),
                    "qwen_decode_ms_per_step_int8w": round(qwen_decode_step_ms_int8w, 2),
                    "qwen_e2e_docs_per_sec": round(qwen_e2e_docs_per_sec, 2),
                    "qwen_e2e_pages_per_sec": round(qwen_e2e_docs_per_sec * QW_E2E_PAGES, 1),
                    "qwen_e2e_ms_per_batch": round(qwen_e2e_time * 1e3, 2),
                    "qwen_model_proxy": "qwen2.5-3b-dims for bf16 rows (16 GB HBM; reference ships 7B, eval.py:459) — the qwen7b_int8_* rows serve the reference's 7B dims via W8",
                    "qwen7b_int8_decode_ms_per_step": round(q7_decode_step_ms, 2),
                    "qwen7b_int8_decode_tokens_per_sec": round(q7_decode_tokens_per_sec, 1),
                    "qwen7b_int8_prefill_tokens_per_sec": round(q7_prefill_tokens_per_sec, 1),
                    "qwen7b_int8_weight_gb": round(q7_bytes / 1e9, 2),
                    "qwen7b_int8_weight_read_gbs": round(q7_weight_read_gbs, 1),
                    "qwen_decode_ms_per_step_b32": round(qwen_decode_step_ms_b32, 2),
                    "bge_embed_retrieve_pages_per_sec": round(bge_pages_per_sec, 1),
                    "bge_mfu": round(bge_mfu, 3),
                    "cl_train_step_ms": round(cl_time * 1e3, 2),
                    "cl_train_tokens_per_sec": round(cl_tokens / cl_time, 1),
                    "cl_train_mfu": round(cl_mfu, 3),
                    "e2e_retrieve_generate_pages_per_sec": round(e2e_pages_per_sec, 1),
                    "e2e_ms_per_batch": round(e2e_time * 1e3, 2),
                    "e2e_mfu": round(e2e_mfu, 3),
                    "e2e_assemble_ms": round(e2e_assemble_ms, 2),
                    "e2e_encode_ms": round(e2e_encode_ms, 2),
                    "e2e_decode_ms": round(e2e_decode_ms, 2),
                    "e2e_pipelined_incl_ingest_pages_per_sec": round(pipe_pages_per_sec, 1),
                    "e2e_serialized_incl_ingest_pages_per_sec": round(seq_pages_per_sec, 1),
                    "train_step_ms": round(train_time * 1e3, 2),
                    "train_tokens_per_sec": round(train_tokens_per_sec, 1),
                    "train_step_mfu": round(train_mfu, 3),
                    "baseline_def": "reference-structure per-doc dispatch loop on same chip, no host syncs",
                },
            }
        )
    )


if __name__ == "__main__":
    # The tunneled chip occasionally drops mid-run (UNAVAILABLE: TPU backend
    # setup/compile error). A fresh PROCESS is required after that — the jax
    # client in this one is poisoned — so retry via re-exec, bounded to two
    # restarts. Measurements are unaffected: each attempt starts clean.
    import os
    import sys
    import time as _time

    attempt = int(os.environ.get("_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:  # noqa: BLE001 — classify, maybe re-exec
        transient = "UNAVAILABLE" in str(e) or "Unavailable" in str(e)
        if transient and attempt < 2:
            print(f"transient TPU error (attempt {attempt + 1}/3), retrying in 3 min: {e}",
                  file=sys.stderr, flush=True)
            _time.sleep(180)
            env = dict(os.environ, _BENCH_ATTEMPT=str(attempt + 1))
            os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
        raise
