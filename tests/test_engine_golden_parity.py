"""Golden ENGINE-level parity vs a torch re-assembly of reference RAGVT5.

The oracle below re-implements, independently of the package code, the
reference retrieve->assemble->generate pipeline for the concat strategy:

  * word chunking with stride + small-tail merge     (src/_modules.py:907-943)
  * chunk compaction + VT5 table mean-pool embedding (src/_modules.py:1102-1132,
                                                      1465-1474, _model_utils.py:49-61)
  * cosine similarity with the reference eps          (src/_modules.py:1990-1993)
  * torch.topk + surrounding-word expansion w/ dedup  (src/_modules.py:2014-2091)
  * generator input assembly: prompt ++ word tokens ++ EOS, per-token boxes,
    truncate-to-512-keeping-EOS                       (src/VT5.py:131-226)
  * HF T5ForConditionalGeneration greedy generate + confidence product
                                                      (src/VT5.py:273-290,
                                                       _model_utils.py:20-24)

Both sides share the same random weights (tiny HF T5 converted via
models/convert.py + one spatial-embedding tree) and the same tokenizer
(ByteTokenizer; tokenization is data-layer infrastructure, not under test).
Asserted identical: top-k chunk indices, generator input token/box sequences,
decoded ids, and confidence to 1e-4.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data import DocVQAIngestor
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.data.tokenizer import ByteTokenizer
from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, RAGVT5Engine, retrieve_device
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.convert import convert_t5_state_dict, torch_state_dict_to_numpy
from rag_docvqa_tpu.models.embeddings import SpatialConfig, init_spatial_params
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.ops.gather import assemble_concat

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


# ---------------------------------------------------------------------------
# shared setup
# ---------------------------------------------------------------------------
TOK = ByteTokenizer()
T5_CFG = t5m.T5Config(
    vocab_size=TOK.vocab_size, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
)
VT5_CFG = vt5m.VT5Config(
    t5=T5_CFG,
    spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32, patch_size=8, image_size=16),
    use_visual=False,
)
CAPS = Caps(max_pages=8, max_chunks=32, max_slots=512, tokens_per_word=16,
            embed_tokens=64, question_tokens=32, prompt_tokens=48)
SPEC = ChunkSpec(chunk_size=10, overlap=2, chunk_size_tol=0.2)
RAG = RAGConfig(page_retrieval="concat", chunk_num=3, include_surroundings=2,
                max_source_length=160, max_new_tokens=8)


@pytest.fixture(scope="module")
def setup():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=TOK.vocab_size, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True, decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    t5_params = convert_t5_state_dict(torch_state_dict_to_numpy(hf), T5_CFG)
    spatial = jax.tree.map(np.asarray, init_spatial_params(jax.random.PRNGKey(3), VT5_CFG.spatial))
    params = jax.tree.map(jnp.asarray, {"t5": t5_params, "spatial": spatial})

    docs = make_corpus(3, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)
    return hf, params, spatial, docs, batch, aux


# ---------------------------------------------------------------------------
# the torch/numpy oracle (reference pipeline re-assembly)
# ---------------------------------------------------------------------------
def oracle_chunks(doc):
    """Reference make_chunks loop (src/_modules.py:907-943): stride
    chunk_size-overlap, merge a small tail into the previous chunk of the
    same page when prev + (this - overlap) <= chunk_size * (1 + tol)."""
    chunks = []  # (page, [word indices])
    for p, words in enumerate(doc.words):
        prev_size = 0
        first_in_page = True
        for i in range(0, len(words), SPEC.chunk_size - SPEC.overlap):
            idx = list(range(i, min(i + SPEC.chunk_size, len(words))))
            this_size = len(idx)
            if (
                not first_in_page
                and prev_size + (this_size - SPEC.overlap) <= SPEC.chunk_size * (1 + SPEC.chunk_size_tol)
            ):
                this_size = prev_size + this_size - SPEC.overlap
                chunks[-1][1].extend(idx[SPEC.overlap:])
            else:
                chunks.append((p, list(idx)))
            prev_size = this_size
            first_in_page = False
    return chunks


def table_embed(shared, ids):
    if not ids:
        return np.zeros(shared.shape[1], np.float32)
    return shared[np.asarray(ids)].mean(axis=0)


def oracle_retrieve(doc, shared, with_sims=False, rag=None):
    """Cosine top-k (src/_modules.py:1978-2016). Returns (chunks, topk_idx
    [, topk_sims])."""
    rag = rag or RAG
    chunks = oracle_chunks(doc)
    embs = []
    for p, widx in chunks:
        text = " ".join(doc.words[p][i] for i in widx)
        embs.append(table_embed(shared, TOK.encode(text)[: CAPS.embed_tokens]))
    q_emb = table_embed(shared, TOK.encode(doc.question)[: CAPS.question_tokens])
    embs = np.stack(embs)
    sims = embs @ q_emb / (np.linalg.norm(embs, axis=1) * np.linalg.norm(q_emb) + 1e-8)
    k = min(rag.chunk_num, len(chunks))
    top = torch.topk(torch.from_numpy(sims), k)
    if with_sims:
        return chunks, top.indices.numpy(), top.values.numpy()
    return chunks, top.indices.numpy()


def oracle_assemble(doc, chunks, topk, rag=None):
    """Surrounding expansion + first-cover dedup + concat flatten
    (src/_modules.py:2022-2091, src/RAGVT5.py:365-370, src/VT5.py:131-226).

    NOTE the reference's "page word list" is the CONCATENATION of the page's
    chunk word lists (src/_modules.py:2040-2050) — overlap-duplicated words
    appear once per chunk, and surroundings/dedup act on positions in that
    concatenated list. Returns (input_ids, boxes_int, n_valid)."""
    rag = rag or RAG
    s = rag.include_surroundings
    # per-page concatenated (word, box) lists + chunk position ranges therein
    page_words = {}  # page -> [(word, box), ...]
    chunk_pos = {}  # chunk idx -> (page, start, end)
    for ci, (p, widx) in enumerate(chunks):
        lst = page_words.setdefault(p, [])
        start = len(lst)
        for i in widx:
            lst.append((doc.words[p][i], doc.boxes[p][i]))
        chunk_pos[ci] = (p, start, len(lst))

    included = {p: set() for p in page_words}
    ordered = []  # (word, box) in output order
    for ci in topk:
        p, start, end = chunk_pos[int(ci)]
        lo = max(0, start - s)
        hi = min(len(page_words[p]), end + s)
        new = [i for i in range(lo, hi) if i not in included[p]]
        included[p].update(new)
        ordered.extend(page_words[p][i] for i in new)

    S = rag.max_source_length
    ids, boxes = [], []
    prompt = TOK.encode(f"question: {doc.question}  context:")[: CAPS.prompt_tokens]
    for t in prompt:
        ids.append(t)
        boxes.append([0, 0, 1000, 1000])
    for word, box in ordered:
        word_ids = TOK.encode_word(word)[: CAPS.tokens_per_word]
        box = (np.asarray(box, np.float32) * 1000).astype(np.int32).tolist()
        for t in word_ids:
            ids.append(t)
            boxes.append(box)
    # truncate keeping EOS (src/VT5.py:166-170)
    ids = ids[: S - 1] + [TOK.eos_id]
    boxes = boxes[: S - 1] + [[0, 0, 0, 0]]
    n = len(ids)
    ids = ids + [TOK.pad_id] * (S - n)
    boxes = boxes + [[0, 0, 0, 0]] * (S - n)
    return np.asarray(ids, np.int32), np.asarray(boxes, np.int32), n


def oracle_generate(hf, spatial, ids_batch, boxes_batch, lens):
    """HF greedy generate over semantic+spatial input embeds; confidence =
    prod of max softmax dropping the final step (_model_utils.py:20-24)."""
    shared_t = hf.get_input_embeddings().weight  # (V, D)
    x_emb = torch.from_numpy(np.asarray(spatial["x_emb"]))
    y_emb = torch.from_numpy(np.asarray(spatial["y_emb"]))
    ln_w = torch.from_numpy(np.asarray(spatial["ln_w"]))
    ln_b = torch.from_numpy(np.asarray(spatial["ln_b"]))
    mk = torch.from_numpy(np.asarray(spatial["matcher"]["kernel"]))
    mb = torch.from_numpy(np.asarray(spatial["matcher"]["bias"]))

    ids_t = torch.from_numpy(ids_batch).long()
    box_t = torch.from_numpy(np.clip(boxes_batch, 0, 1023)).long()
    sem = shared_t[ids_t]
    sp = x_emb[box_t[..., 0]] + y_emb[box_t[..., 1]] + x_emb[box_t[..., 2]] + y_emb[box_t[..., 3]]
    sp = torch.nn.functional.layer_norm(sp, sp.shape[-1:], ln_w, ln_b, eps=1e-12)
    sp = sp @ mk + mb
    embeds = sem + sp
    mask = (torch.arange(ids_batch.shape[1])[None, :] < torch.as_tensor(lens)[:, None]).long()

    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=embeds, attention_mask=mask,
            max_new_tokens=RAG.max_new_tokens, do_sample=False, num_beams=1,
            output_scores=True, return_dict_in_generate=True,
        )
    seqs = out.sequences.numpy()[:, 1:]  # drop decoder_start
    scores = torch.stack(out.scores, dim=1)[:, :-1, :]  # drop final step
    conf = torch.amax(scores.softmax(-1), 2).prod(1).numpy()
    return seqs, conf


def _truncate(row, eos_id, pad_id):
    out = []
    for t in row:
        if t == eos_id:
            break
        if t != pad_id:
            out.append(int(t))
    return out


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------
def test_concat_engine_matches_reference_reassembly(setup):
    hf, params, spatial, docs, batch, aux = setup
    shared = np.asarray(params["t5"]["shared"])

    # --- engine side -------------------------------------------------------
    ret = retrieve_device(params["t5"]["shared"], batch, k=RAG.chunk_num)
    gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, RAG.assemble())
    eng = RAGVT5Engine(RAG, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)

    top_idx = np.asarray(ret.top_k_idx)
    top_valid = np.asarray(ret.top_k_valid)
    gen_ids = np.asarray(gen.input_ids)
    gen_boxes = np.asarray(gen.input_boxes)

    for b, doc in enumerate(docs):
        chunks, o_topk = oracle_retrieve(doc, shared)
        # 1. identical top-k chunk indices (ingest enumerates chunks in the
        #    same page-major order as the oracle)
        k = len(o_topk)
        assert top_valid[b, :k].all()
        assert not top_valid[b, k:].any()
        np.testing.assert_array_equal(top_idx[b, :k], o_topk)

        # 2. identical generator input token/box sequences
        o_ids, o_boxes, _ = oracle_assemble(doc, chunks, o_topk)
        np.testing.assert_array_equal(gen_ids[b], o_ids)
        np.testing.assert_array_equal(gen_boxes[b], o_boxes)

    # 3/4. identical decoded ids + confidence vs HF generate
    lens = [int(np.asarray(gen.attention_mask)[b].sum()) for b in range(len(docs))]
    o_seqs, o_conf = oracle_generate(hf, spatial, gen_ids, gen_boxes, lens)
    for b in range(len(docs)):
        o_ids = _truncate(o_seqs[b], TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_ids)
    np.testing.assert_allclose(np.asarray(out["confidences"]), o_conf, rtol=1e-4, atol=1e-5)


def test_maxconf_engine_matches_reference_reassembly(setup):
    """Second strategy: per-chunk generation rows (maxconf,
    src/RAGVT5.py:386-454) — each retrieved rank generates on its own words
    (surroundings + first-cover dedup), the max-confidence row answers."""
    hf, params, spatial, docs, batch, aux = setup
    shared = np.asarray(params["t5"]["shared"])
    import dataclasses

    rag = dataclasses.replace(RAG, page_retrieval="maxconf", per_chunk_seq_len=96)
    eng = RAGVT5Engine(rag, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)

    from rag_docvqa_tpu.ops.gather import assemble_per_chunk

    ret = retrieve_device(params["t5"]["shared"], batch, k=rag.chunk_num)
    gen, owner, row_valid = assemble_per_chunk(
        batch, ret.top_k_idx, ret.top_k_valid, rag.assemble(), seq_len=rag.per_chunk_seq_len
    )
    gen_ids = np.asarray(gen.input_ids)
    gen_boxes = np.asarray(gen.input_boxes)
    K = rag.chunk_num

    for b, doc in enumerate(docs):
        chunks, o_topk = oracle_retrieve(doc, shared)
        # oracle per-rank rows: same slot-space windows/dedup as the concat
        # oracle, but each rank's new words form their own generator row
        s = rag.include_surroundings
        page_words = {}
        chunk_pos = {}
        for ci, (p, widx) in enumerate(chunks):
            lst = page_words.setdefault(p, [])
            start = len(lst)
            for i in widx:
                lst.append((doc.words[p][i], doc.boxes[p][i]))
            chunk_pos[ci] = (p, start, len(lst))
        included = {p: set() for p in page_words}
        prompt = TOK.encode(f"question: {doc.question}  context:")[: CAPS.prompt_tokens]
        S = rag.per_chunk_seq_len
        for rank, ci in enumerate(o_topk):
            p, start, end = chunk_pos[int(ci)]
            lo = max(0, start - s)
            hi = min(len(page_words[p]), end + s)
            new = [i for i in range(lo, hi) if i not in included[p]]
            included[p].update(new)
            ids, boxes = [], []
            for t in prompt:
                ids.append(t)
                boxes.append([0, 0, 1000, 1000])
            for i in new:
                word, box = page_words[p][i]
                wb = (np.asarray(box, np.float32) * 1000).astype(np.int32).tolist()
                for t in TOK.encode_word(word)[: CAPS.tokens_per_word]:
                    ids.append(t)
                    boxes.append(wb)
            ids = ids[: S - 1] + [TOK.eos_id]
            boxes = boxes[: S - 1] + [[0, 0, 0, 0]]
            n = len(ids)
            ids += [TOK.pad_id] * (S - n)
            boxes += [[0, 0, 0, 0]] * (S - n)
            row = b * K + rank
            np.testing.assert_array_equal(gen_ids[row], np.asarray(ids, np.int32))
            np.testing.assert_array_equal(gen_boxes[row], np.asarray(boxes, np.int32))

    # decoded max-conf answer parity via HF generate over the same rows
    lens = np.asarray(gen.attention_mask).sum(axis=1)
    o_seqs, o_conf = oracle_generate(hf, spatial, gen_ids, gen_boxes, lens.tolist())
    valid_np = np.asarray(row_valid)
    for b in range(len(docs)):
        rows = np.where(valid_np[b])[0]
        best = rows[np.argmax(o_conf[b * K + rows])]
        o_ids = _truncate(o_seqs[b * K + best], TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_ids)


def test_weightmajorpage_engine_matches_reference_reassembly(setup):
    """Page-vote strategy family (src/RAGVT5.py:455-486): similarity-weighted
    page vote over the top-k chunks -> ONE whole-page generator row built from
    the page's ORIGINAL word list (new_batch["words"][b][page]). Weights use
    the top-k-aligned similarities (the reference's intended semantics; its
    reranker-off path zips against the full similarity vector by mistake —
    divergence documented in engine/rag_vt5.py)."""
    hf, params, spatial, docs, batch, aux = setup
    shared = np.asarray(params["t5"]["shared"])
    import dataclasses

    rag = dataclasses.replace(RAG, page_retrieval="weightmajorpage")
    eng = RAGVT5Engine(rag, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)

    S = rag.max_source_length
    o_ids_rows, o_box_rows, o_pages = [], [], []
    for b, doc in enumerate(docs):
        chunks, o_topk, o_sims = oracle_retrieve(doc, shared, with_sims=True)
        w = o_sims / o_sims.sum()  # normalized weights (RAGVT5.py:463)
        votes = {}
        for ci, wi in zip(o_topk, w):
            votes[chunks[int(ci)][0]] = votes.get(chunks[int(ci)][0], 0.0) + wi
        # ties are measure-zero with real-valued sims; lowest page on exact tie
        page = max(sorted(votes), key=lambda p: votes[p])
        o_pages.append(page)

        ids, boxes = [], []
        prompt = TOK.encode(f"question: {doc.question}  context:")[: CAPS.prompt_tokens]
        for t in prompt:
            ids.append(t)
            boxes.append([0, 0, 1000, 1000])
        for word, box in zip(doc.words[page], doc.boxes[page]):
            wb = (np.asarray(box, np.float32) * 1000).astype(np.int32).tolist()
            for t in TOK.encode_word(word)[: CAPS.tokens_per_word]:
                ids.append(t)
                boxes.append(wb)
        ids = ids[: S - 1] + [TOK.eos_id]
        boxes = boxes[: S - 1] + [[0, 0, 0, 0]]
        n = len(ids)
        ids += [TOK.pad_id] * (S - n)
        boxes += [[0, 0, 0, 0]] * (S - n)
        o_ids_rows.append(ids)
        o_box_rows.append(boxes)

    # 1. engine picked the same majority page
    assert [int(p) for p in out["pred_answer_pages"]] == o_pages

    # 2. identical whole-page generator rows
    from rag_docvqa_tpu.engine.rag_vt5 import majority_page_device
    from rag_docvqa_tpu.ops.gather import assemble_page_rows

    ret = retrieve_device(params["t5"]["shared"], batch, k=rag.chunk_num)
    major = majority_page_device(ret, weighted=True)
    gen = assemble_page_rows(
        batch, major[:, None], jnp.ones((len(docs), 1), bool), rag.assemble()
    )
    gen_ids = np.asarray(gen.input_ids)
    gen_boxes = np.asarray(gen.input_boxes)
    np.testing.assert_array_equal(gen_ids, np.asarray(o_ids_rows, np.int32))
    np.testing.assert_array_equal(gen_boxes, np.asarray(o_box_rows, np.int32))

    # 3. decoded answers + confidence vs HF generate on the same rows
    lens = np.asarray(gen.attention_mask).sum(axis=1).tolist()
    o_seqs, o_conf = oracle_generate(hf, spatial, gen_ids, gen_boxes, lens)
    for b in range(len(docs)):
        o_answer = _truncate(o_seqs[b], TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_answer)
    np.testing.assert_allclose(np.asarray(out["confidences"]), o_conf, rtol=1e-4, atol=1e-5)


def test_hivt5_engine_matches_reference_reassembly(setup):
    """Hierarchical family (src/HiVT5.py:450-556): per-page encode of
    [PAGE_p] x K ++ prompt ++ page words (+spatial), keep the first K hidden
    states per page, decoder cross-attends the concatenated document
    embedding, page-retrieval head predicts the answer page. The oracle runs
    each page through the HF T5 encoder sequentially (the reference's
    per-page loop, HiVT5.py:78-104) and decodes with HF generate over
    encoder_outputs. Engine replaces the loop with pages-folded-into-batch —
    outputs must be identical."""
    import dataclasses

    from transformers.modeling_outputs import BaseModelOutput

    from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine
    from rag_docvqa_tpu.models import hivt5 as hivt5m
    from rag_docvqa_tpu.models.layers import normal_init

    hf, params, spatial, docs, batch, aux = setup
    P, K, SEQ, NEW = 4, 3, 64, 8
    hcfg = hivt5m.HiVT5Config(
        t5=T5_CFG, spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
        page_tokens=K, max_doc_pages=P, page_seq_len=SEQ,
    )
    rng = jax.random.PRNGKey(11)
    page_emb = np.asarray(normal_init(rng, (P, 32), 1.0))
    head_k = np.asarray(normal_init(jax.random.fold_in(rng, 1), (P * K * 32, P), 0.02))
    hparams = {
        "t5": params["t5"], "spatial": params["spatial"],
        "page_emb": jnp.asarray(page_emb),
        "page_head": {"kernel": jnp.asarray(head_k), "bias": jnp.zeros((P,))},
    }

    eng = HiVT5Engine(hcfg, hparams, TOK, max_new_tokens=NEW)
    out = eng.inference(batch, aux)

    # ---- oracle: sequential per-page HF encode -> concat -> HF generate ----
    shared_t = hf.get_input_embeddings().weight
    x_emb = torch.from_numpy(np.asarray(spatial["x_emb"]))
    y_emb = torch.from_numpy(np.asarray(spatial["y_emb"]))
    ln_w = torch.from_numpy(np.asarray(spatial["ln_w"]))
    ln_b = torch.from_numpy(np.asarray(spatial["ln_b"]))
    mk = torch.from_numpy(np.asarray(spatial["matcher"]["kernel"]))
    mb = torch.from_numpy(np.asarray(spatial["matcher"]["bias"]))
    page_emb_t = torch.from_numpy(page_emb)

    def page_row(doc, p):
        """prompt ++ page words ++ EOS (truncate keeping EOS), like the
        whole-page rows of the page-level strategies."""
        ids, boxes = [], []
        prompt = TOK.encode(f"question: {doc.question}  context:")[: CAPS.prompt_tokens]
        for t in prompt:
            ids.append(t)
            boxes.append([0, 0, 1000, 1000])
        for word, box in zip(doc.words[p], doc.boxes[p]):
            wb = (np.asarray(box, np.float32) * 1000).astype(np.int32).tolist()
            for t in TOK.encode_word(word)[: CAPS.tokens_per_word]:
                ids.append(t)
                boxes.append(wb)
        ids = ids[: SEQ - 1] + [TOK.eos_id]
        boxes = boxes[: SEQ - 1] + [[0, 0, 0, 0]]
        n = len(ids)
        ids += [TOK.pad_id] * (SEQ - n)
        boxes += [[0, 0, 0, 0]] * (SEQ - n)
        return np.asarray(ids), np.asarray(boxes), n

    B = len(docs)
    doc_embs = torch.zeros((B, P * K, 32))
    doc_mask = torch.zeros((B, P * K), dtype=torch.long)
    o_pages = []
    with torch.no_grad():
        for b, doc in enumerate(docs):
            for p in range(min(P, len(doc.words))):
                ids, boxes, n = page_row(doc, p)
                ids_t = torch.from_numpy(ids).long()[None]
                box_t = torch.from_numpy(np.clip(boxes, 0, 1023)).long()[None]
                sem = shared_t[ids_t]
                sp = x_emb[box_t[..., 0]] + y_emb[box_t[..., 1]] + x_emb[box_t[..., 2]] + y_emb[box_t[..., 3]]
                sp = torch.nn.functional.layer_norm(sp, sp.shape[-1:], ln_w, ln_b, eps=1e-12)
                embeds = sem + sp @ mk + mb
                embeds = torch.cat([page_emb_t[p][None, None].expand(1, K, 32), embeds], dim=1)
                mask = torch.zeros((1, K + SEQ), dtype=torch.long)
                mask[0, : K + n] = 1
                enc = hf.encoder(inputs_embeds=embeds, attention_mask=mask)
                doc_embs[b, p * K : (p + 1) * K] = enc.last_hidden_state[0, :K]
                doc_mask[b, p * K : (p + 1) * K] = 1
            # page head over the flattened document embedding
            logits = doc_embs[b].reshape(-1) @ torch.from_numpy(head_k)
            logits = logits.numpy()
            logits[min(P, len(doc.words)):] = -1e9
            o_pages.append(int(np.argmax(logits)))

        gen = hf.generate(
            encoder_outputs=BaseModelOutput(last_hidden_state=doc_embs),
            attention_mask=doc_mask,
            max_new_tokens=NEW, do_sample=False, num_beams=1,
            output_scores=True, return_dict_in_generate=True,
        )
    o_seqs = gen.sequences.numpy()[:, 1:]
    scores = torch.stack(gen.scores, dim=1)[:, :-1, :]
    o_conf = torch.amax(scores.softmax(-1), 2).prod(1).numpy()

    assert [int(p) for p in out["pred_answer_pages"]] == o_pages
    for b in range(B):
        o_ids = _truncate(o_seqs[b], TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_ids)
    np.testing.assert_allclose(np.asarray(out["confidences"]), o_conf, rtol=1e-4, atol=1e-5)
