"""Golden ENGINE-level parity, part 2: the families round 2 left uncovered.

Same methodology as test_engine_golden_parity.py — each test re-assembles the
reference pipeline independently of the package code (torch/numpy oracle,
template strings restated from the reference) and asserts the engine's
retrieval, assembly, and generation outputs match:

  * RAGQwen: retrieval -> ChatML prompt (src/QwenVLInstruct.py:122-146)
    -> HF Qwen2 greedy generate + "assistant:" strip (:234-264)
  * NAC-enabled RAGVT5: concat pipeline + NotAnswerableClassifier blanking
    (src/RAGVT5.py:101-115, src/_modules.py:2467-2507)
  * reranker-enabled RAGVT5 and RAGPix2Struct live in this file too.

Tokenization and pixel resizing are data-layer infrastructure (shared between
engine and oracle, stated policy of part 1); everything else — template
strings, retrieval math, dedup, packing offsets, probability products — is
re-derived in the oracle.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data import DocVQAIngestor
from rag_docvqa_tpu.data.synthetic import make_corpus

from test_engine_golden_parity import (  # sibling oracle helpers (part 1)
    CAPS,
    RAG,
    SPEC,
    T5_CFG,
    TOK,
    VT5_CFG,
    _truncate,
    oracle_assemble,
    oracle_generate,
    oracle_retrieve,
)

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


# ---------------------------------------------------------------------------
# RAGQwen: ChatML prompt + decoder-only greedy generate
# ---------------------------------------------------------------------------
QWEN_CFG_KW = dict(
    vocab_size=TOK.vocab_size, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, rope_theta=1_000_000.0,
    tie_word_embeddings=True, attention_dropout=0.0,
)


def oracle_chatml_prompt(question: str, context_rows) -> str:
    """The reference's chat template rendered to a string — restated from
    src/QwenVLInstruct.py:122-146 (apply_chat_template with the Qwen2.5
    system prompt) independently of engine.rag_qwen's constants."""
    return (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n"
        f"question: {question}\n"
        "Directly provide only a short direct answer to the question. "
        f"The answer appears in the following context. Context: {' '.join(context_rows)}"
        "<|im_end|>\n<|im_start|>assistant\n"
    )


def oracle_context_rows(doc, shared, include_surroundings):
    """Per-rank retrieved text incl. surroundings with first-cover dedup
    (src/_modules.py:2022-2091) — the strings the reference feeds the chat
    prompt (RAGVT5.py:72-82 routes retrieval text to the Qwen generator)."""
    chunks, o_topk = oracle_retrieve(doc, shared)
    s = include_surroundings
    page_words, chunk_pos = {}, {}
    for ci, (p, widx) in enumerate(chunks):
        lst = page_words.setdefault(p, [])
        start = len(lst)
        for i in widx:
            lst.append(doc.words[p][i])
        chunk_pos[ci] = (p, start, len(lst))
    included = {p: set() for p in page_words}
    rows = []
    for ci in o_topk:
        p, start, end = chunk_pos[int(ci)]
        lo = max(0, start - s)
        hi = min(len(page_words[p]), end + s)
        new = [i for i in range(lo, hi) if i not in included[p]]
        included[p].update(new)
        rows.append(" ".join(page_words[p][i] for i in new))
    return rows, o_topk


def test_qwen_engine_matches_reference_reassembly():
    """RAGQwen family: same retrieval stack, ChatML prompt text, and the
    decoder-only greedy decode vs per-sample (unpadded) HF Qwen2 generate —
    the ragged right-padded engine batch must reproduce the reference's
    left-padded contiguous-position decode exactly."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine, build_prompt
    from rag_docvqa_tpu.models import causal_lm as clm

    lm_cfg = clm.CausalLMConfig(
        vocab_size=TOK.vocab_size, d_model=32, num_layers=2, num_heads=4,
        num_kv_heads=2, d_ff=64, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(Qwen2Config(**QWEN_CFG_KW)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, clm.convert_qwen2_state_dict(sd, lm_cfg))

    docs = make_corpus(3, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)

    NEW = 6
    qcfg = QwenRAGConfig(chunk_num=RAG.chunk_num, include_surroundings=2,
                         max_prompt_tokens=448, max_new_tokens=NEW)
    eng = RAGQwenEngine(qcfg, lm_cfg, params, TOK)
    out = eng.inference(batch, aux)
    texts, pages = eng.retrieve_texts(batch, aux)

    shared = np.asarray(params["embed"])
    for b, doc in enumerate(docs):
        o_rows, o_topk = oracle_context_rows(doc, shared, qcfg.include_surroundings)
        # 1. retrieved per-rank context rows identical (surroundings + dedup)
        assert texts[b] == o_rows
        # 2. prompt template string parity (engine constants vs restated template)
        assert build_prompt(doc.question, texts[b]) == oracle_chatml_prompt(doc.question, o_rows)

        # 3. decode parity: HF greedy on the engine's (unpadded) prompt ids
        ids, mask, _, _, lens = eng._assemble_prompts([doc.question], [texts[b]], None)
        n = int(lens[0])
        row = torch.from_numpy(ids[:1, :n].astype(np.int64))
        with torch.no_grad():
            gen = hf.generate(
                row, max_new_tokens=NEW, do_sample=False, num_beams=1,
                output_scores=True, return_dict_in_generate=True,
            )
        o_ids = _truncate(gen.sequences[0, n:].numpy(), lm_cfg.eos_id, lm_cfg.pad_id)
        o_text = TOK.decode(o_ids).split("assistant:")[-1].replace("<|im_end|>", "").strip()
        assert out["pred_answers"][b] == o_text
        scores = torch.stack(gen.scores, dim=1)[:, :-1, :]
        o_conf = torch.amax(scores.softmax(-1), 2).prod(1).numpy()[0]
        np.testing.assert_allclose(out["confidences"][b], o_conf, rtol=1e-3, atol=1e-4)
        # 4. predicted pages = pages of the valid top-k chunks
        chunks, _ = oracle_retrieve(doc, shared)
        assert pages[b] == [chunks[int(ci)][0] for ci in o_topk]


# ---------------------------------------------------------------------------
# NAC-enabled RAGVT5: concat pipeline + not-answerable blanking
# ---------------------------------------------------------------------------
def test_nac_engine_matches_reference_reassembly():
    """NAC family (src/RAGVT5.py:101-115): the concat pipeline's answers pass
    through the NotAnswerableClassifier — sigmoid(MLP([mean(input embeds);
    mean(answer embeds)])) — and p > 0.5 blanks the answer and zeroes the
    confidence (src/_modules.py:2467-2507). Oracle: numpy MLP over the same
    embeddings, HF generate for the pre-NAC answers."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from rag_docvqa_tpu.engine.rag_vt5 import RAGVT5Engine
    from rag_docvqa_tpu.models.convert import convert_t5_state_dict, torch_state_dict_to_numpy
    from rag_docvqa_tpu.models.embeddings import init_spatial_params
    from rag_docvqa_tpu.models.nac import NACConfig, init_nac_params

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
    nac_params = init_nac_params(jax.random.PRNGKey(9), NACConfig(emb_dim=32))

    docs = make_corpus(3, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)

    # pick a threshold between the min/max oracle probabilities so BOTH
    # branches (blanked and kept) are exercised, whatever the random init does
    eng_probe = RAGVT5Engine(RAG, VT5_CFG, params, TOK, nac=(nac_params, 0.5))
    probe = eng_probe.inference(batch, aux)
    probs = np.asarray(probe["retrieval"]["not_answerable_probs"])
    thr = float(np.median(probs))
    eng = RAGVT5Engine(RAG, VT5_CFG, params, TOK, nac=(nac_params, thr))
    out = eng.inference(batch, aux)

    # ---- oracle ----
    shared = np.asarray(params["t5"]["shared"])
    ids_rows, box_rows, lens = [], [], []
    for doc in docs:
        chunks, o_topk = oracle_retrieve(doc, shared)
        ids, boxes, n = oracle_assemble(doc, chunks, o_topk)
        ids_rows.append(ids)
        box_rows.append(boxes)
        lens.append(n)
    ids_b = np.stack(ids_rows)
    box_b = np.stack(box_rows)
    o_seqs, o_conf = oracle_generate(hf, spatial, ids_b, box_b, lens)

    # numpy NAC: mean input embeds (semantic + spatial, over the attention
    # mask) ++ mean answer embeds -> relu MLP -> sigmoid
    def spatial_np(boxes):
        x_emb = np.asarray(spatial["x_emb"])
        y_emb = np.asarray(spatial["y_emb"])
        b = np.clip(boxes, 0, 1023)
        sp = x_emb[b[..., 0]] + y_emb[b[..., 1]] + x_emb[b[..., 2]] + y_emb[b[..., 3]]
        mu = sp.mean(-1, keepdims=True)
        var = sp.var(-1, keepdims=True)
        sp = (sp - mu) / np.sqrt(var + 1e-12)
        sp = sp * np.asarray(spatial["ln_w"]) + np.asarray(spatial["ln_b"])
        return sp @ np.asarray(spatial["matcher"]["kernel"]) + np.asarray(spatial["matcher"]["bias"])

    o_answers, o_confs, o_probs = [], [], []
    for b, doc in enumerate(docs):
        n = lens[b]
        inp = shared[ids_b[b, :n]] + spatial_np(box_b[b, :n])
        ans_ids = _truncate(o_seqs[b], TOK.eos_id, TOK.pad_id)
        answer = TOK.decode(ans_ids)
        enc = TOK.encode(answer)
        ans_emb = shared[np.asarray(enc)].mean(0) if enc else np.zeros_like(inp[0])
        feat = np.concatenate([inp.mean(0), ans_emb])
        h = feat
        for i, layer in enumerate(jax.tree.map(np.asarray, nac_params["mlp"])):
            h = h @ layer["kernel"] + layer["bias"]
            if i < len(nac_params["mlp"]) - 1:
                h = np.maximum(h, 0.0)
        p = float(1.0 / (1.0 + np.exp(-h[0])))
        o_probs.append(p)
        if p > thr:
            o_answers.append("")
            o_confs.append(0.0)
        else:
            o_answers.append(answer)
            o_confs.append(float(o_conf[b]))

    assert any(a == "" for a in o_answers) and any(a != "" for a in o_answers)
    assert out["pred_answers"] == o_answers
    np.testing.assert_allclose(np.asarray(out["confidences"]), o_confs, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["retrieval"]["not_answerable_probs"]), o_probs, rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# RAGPix2Struct: visual retrieval + patch packing + generate
# ---------------------------------------------------------------------------
def _oracle_strips(img, patch_size, overlap):
    """Horizontal strip chunking with tail merge — restated from
    src/_modules.py:1203-1244."""
    import math

    H, W = img.shape[:2]
    ov = patch_size // 2 if overlap else 0
    step = patch_size - ov
    n_h = math.ceil((H - ov) / step)
    last_h = H - (n_h - 1) * step
    n_actual = n_h - 1 if (0 < last_h < patch_size and n_h > 1) else n_h
    strips, boxes = [], []
    for i in range(n_actual):
        top = i * step
        if i == n_actual - 1 and n_actual < n_h:
            bottom = H
        else:
            bottom = min(top + patch_size, H)
            if bottom - top < patch_size:
                top = max(bottom - patch_size, 0)
        strips.append(img[top:bottom, 0:W])
        boxes.append([0, top, W, bottom])
    return strips, boxes


def _oracle_flat_patches(img, max_patches, row_offset=0, pad=True):
    """Pix2Struct patch extraction — scale/grid/ids math restated from
    src/custom_pix2struct_processor.py:33-95 (pixel resize is shared
    infrastructure, like tokenization in part 1)."""
    import math

    from rag_docvqa_tpu.ops.patches import _resize_bilinear

    P = 16
    h, w = img.shape[:2]
    scale = math.sqrt(max_patches * (P / h) * (P / w))
    rows = max(min(math.floor(scale * h / P), max_patches), 1)
    cols = max(min(math.floor(scale * w / P), max_patches), 1)
    img = _resize_bilinear(img.astype(np.float32), rows * P, cols * P)
    x = img.reshape(rows, P, cols, P, 3).transpose(0, 2, 1, 3, 4).reshape(rows * cols, P * P * 3)
    rid = (np.repeat(np.arange(rows), cols) + 1 + row_offset).astype(np.float32)
    cid = (np.tile(np.arange(cols), rows) + 1).astype(np.float32)
    out = np.concatenate([rid[:, None], cid[:, None], x], axis=1)
    if pad and out.shape[0] < max_patches:
        out = np.concatenate([out, np.zeros((max_patches - out.shape[0], out.shape[1]), out.dtype)])
    else:
        out = out[:max_patches]
    return out, int(rid.max())


def _oracle_adaptive_norm(img):
    img = img.astype(np.float32)
    return (img - img.mean()) / max(img.std(), 1.0 / np.sqrt(img.size))


def _oracle_pack(crops, budget, header):
    """Multi-image packing with continued row offsets + equal budget
    (src/custom_pix2struct_processor.py:97-132) and header stacking
    (white-pad to the max width, header above body)."""
    crops = list(crops)
    w = max(header.shape[1], crops[0].shape[1])

    def pad_w(x):
        if x.shape[1] == w:
            return x
        return np.concatenate(
            [x, np.full((x.shape[0], w - x.shape[1], 3), 255, x.dtype)], axis=1
        )

    crops[0] = np.concatenate([pad_w(header.astype(crops[0].dtype)), pad_w(crops[0])], axis=0)
    per = budget // len(crops)
    out, off = [], 0
    for c in crops:
        p, off = _oracle_flat_patches(_oracle_adaptive_norm(c), per, row_offset=off, pad=False)
        out.append(p)
    cat = np.concatenate(out, axis=0)
    if cat.shape[0] < budget:
        cat = np.concatenate([cat, np.zeros((budget - cat.shape[0], cat.shape[1]), cat.dtype)])
    else:
        cat = cat[:budget]
    mask = (np.abs(cat).sum(-1) != 0).astype(np.float32)
    return cat, mask


def test_p2s_engine_matches_reference_reassembly():
    """RAGPix2Struct family (src/RAGPix2Struct.py:104-334): strip chunking ->
    Pix2Struct-encoder patch embeddings -> MaxSim vs the rendered question ->
    spiral surroundings -> overlap-merge crops -> multi-image packing with
    continued row offsets + question header -> greedy generate. Oracle: the
    geometry/packing math restated above + HF Pix2StructForConditional-
    Generation for encoding and generation."""
    import transformers
    from transformers import Pix2StructForConditionalGeneration

    from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.models import t5 as t5m_mod
    from rag_docvqa_tpu.ops.patches import pack_multi_image_patches, render_text

    p2s_cfg = p2s.Pix2StructConfig(
        vision=p2s.P2SVisionConfig(hidden_size=32, num_layers=2, num_heads=4, d_ff=64,
                                   patch_dim=768, max_rows=128, max_cols=128),
        text=t5m_mod.T5Config(vocab_size=TOK.vocab_size, d_model=32, d_kv=8, num_heads=4,
                              d_ff=64, num_encoder_layers=0, num_decoder_layers=2,
                              gated_ffn=True, tie_word_embeddings=False, dropout_rate=0.0),
    )
    hf_cfg = transformers.Pix2StructConfig(
        text_config=transformers.Pix2StructTextConfig(
            vocab_size=TOK.vocab_size, hidden_size=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, dropout_rate=0.0,
        ).to_dict(),
        vision_config=transformers.Pix2StructVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4, d_ff=64,
            patch_embed_hidden_size=768, seq_len=128, dropout_rate=0.0,
            attention_dropout=0.0,
        ).to_dict(),
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf = Pix2StructForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, p2s.convert_p2s_state_dict(sd, p2s_cfg))

    # structured random pages (blocks of distinct intensity so MaxSim has a
    # clear signal and no near-tie ranks)
    rng = np.random.RandomState(7)
    docs_imgs, questions = [], []
    for d in range(2):
        pages = []
        for p in range(2):
            img = np.full((520, 384, 3), 255, np.uint8)
            for _ in range(6):
                y, x = rng.randint(0, 400), rng.randint(0, 300)
                img[y:y + rng.randint(30, 110), x:x + rng.randint(30, 80)] = rng.randint(0, 255, 3)
            pages.append(img)
        docs_imgs.append(pages)
        questions.append(f"what is item {d} of the form?")

    NEW = 5
    cfg = P2SRAGConfig(chunk_num=2, include_surroundings=3, chunk_mode="horizontal",
                       image_patch_size=256, chunk_overlap=True, patches_per_chunk=64,
                       max_chunks=8, max_total_patches=192, max_new_tokens=NEW)
    eng = RAGPix2StructEngine(cfg, p2s_cfg, params, TOK)
    from rag_docvqa_tpu.data.contract import RawDocument

    docs = [RawDocument(question=q, words=[[]], boxes=[[]], images=imgs)
            for q, imgs in zip(questions, docs_imgs)]
    crops_eng, pages_eng, vals_eng, _ = eng._retrieve_batch(questions, docs_imgs, return_steps=True)
    out = eng.inference(docs)

    for b in range(2):
        # ---- oracle retrieval ------------------------------------------------
        chunks, coords, xyxy, shapes = [], [], [], []
        for pi, img in enumerate(docs_imgs[b]):
            strips, boxes = _oracle_strips(img, cfg.image_patch_size, cfg.chunk_overlap)
            shapes.append((len(strips), 1))
            for i, (s, box) in enumerate(zip(strips, boxes)):
                chunks.append(s)
                coords.append((pi, i, 0))
                xyxy.append(box)
        T = cfg.patches_per_chunk
        feats = np.stack([
            _oracle_flat_patches(_oracle_adaptive_norm(c), T)[0] for c in chunks
        ])
        q_feat = _oracle_flat_patches(_oracle_adaptive_norm(render_text(questions[b])), T)[0]
        fmask = (np.abs(feats).sum(-1) != 0)
        qmask = (np.abs(q_feat).sum(-1) != 0)
        with torch.no_grad():
            emb = hf.encoder(
                flattened_patches=torch.from_numpy(np.concatenate([feats, q_feat[None]])),
                attention_mask=torch.from_numpy(
                    np.concatenate([fmask, qmask[None]]).astype(np.float32)),
            ).last_hidden_state.numpy()
        p_emb, q_emb = emb[:-1], emb[-1]
        # MaxSim (src/utils.py:442-458): normalize, max over patch tokens,
        # sum over query tokens
        qn = q_emb / (np.linalg.norm(q_emb, axis=-1, keepdims=True) + 1e-12)
        pn = p_emb / (np.linalg.norm(p_emb, axis=-1, keepdims=True) + 1e-12)
        sims = np.einsum("qd,ntd->nqt", qn, pn)
        sims[~fmask[:, None, :].repeat(T, 1)] = -np.inf
        ms = sims.max(-1)
        ms[~np.isfinite(ms)] = 0.0
        scores = (ms * qmask[None, :]).sum(-1)
        k = min(cfg.chunk_num, len(chunks))
        o_top = torch.topk(torch.from_numpy(scores), k).indices.numpy()
        np.testing.assert_allclose(
            np.asarray(vals_eng)[b, :k], np.sort(scores)[::-1][:k], rtol=2e-3, atol=2e-3
        )

        # ---- oracle surroundings + merge ------------------------------------
        surround = set()
        for ci in o_top:
            pi, row, col = coords[ci]
            rows_, cols_ = shapes[pi]
            level, phase = cfg.include_surroundings // 3, cfg.include_surroundings % 3
            cand = set()
            for r in range(row - level, row + level + 1):
                for c in range(col - level, col + level + 1):
                    cand.add((r, c))
            if phase > 0:
                for r in range(row - level, row + level + 1):
                    cand.add((r, col - level - 1))
                    cand.add((r, col + level + 1))
            if phase > 1:
                for c in range(col - level, col + level + 1):
                    cand.add((row - level - 1, c))
                    cand.add((row + level + 1, c))
            for r, c in cand:
                if 0 <= r < rows_ and 0 <= c < cols_:
                    surround.add((pi, r, c))
        assert pages_eng[b] == sorted({p for p, _, _ in surround})
        # connected components of overlapping rects -> bbox-union crops
        coord_to_flat = {c: i for i, c in enumerate(coords)}
        o_crops = []
        by_page = {}
        for pi, r, c in sorted(surround):
            by_page.setdefault(pi, []).append(xyxy[coord_to_flat[(pi, r, c)]])
        for pi, rects in sorted(by_page.items()):
            seen = [False] * len(rects)
            for i in range(len(rects)):
                if seen[i]:
                    continue
                comp, queue = [], [i]
                seen[i] = True
                while queue:
                    u = queue.pop()
                    comp.append(rects[u])
                    for v in range(len(rects)):
                        if not seen[v] and (rects[u][0] < rects[v][2] and rects[u][2] > rects[v][0]
                                            and rects[u][1] < rects[v][3] and rects[u][3] > rects[v][1]):
                            seen[v] = True
                            queue.append(v)
                x1 = min(r[0] for r in comp); y1 = min(r[1] for r in comp)
                x2 = max(r[2] for r in comp); y2 = max(r[3] for r in comp)
                o_crops.append(docs_imgs[b][pi][y1:y2, x1:x2])
        assert len(crops_eng[b]) == len(o_crops)
        for ce, co in zip(crops_eng[b], o_crops):
            np.testing.assert_array_equal(ce, co)

        # ---- packing parity: oracle pack == package pack on the same crops --
        header = render_text(questions[b])
        o_patches, o_mask = _oracle_pack([c.copy() for c in o_crops], cfg.max_total_patches, header)
        e_patches, e_mask = pack_multi_image_patches(
            o_crops, cfg.max_total_patches, normalize=True, header=header
        )
        np.testing.assert_allclose(e_patches, o_patches, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(e_mask, o_mask)

        # ---- generation parity: HF generate on the oracle patches -----------
        with torch.no_grad():
            gen = hf.generate(
                flattened_patches=torch.from_numpy(o_patches[None]),
                attention_mask=torch.from_numpy(o_mask[None]),
                max_new_tokens=NEW, do_sample=False, num_beams=1,
                output_scores=True, return_dict_in_generate=True,
                decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
            )
        o_ids = _truncate(gen.sequences[0, 1:].numpy(), TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_ids)
        scores_t = torch.stack(gen.scores, dim=1)[:, :-1, :]
        o_conf = torch.amax(scores_t.softmax(-1), 2).prod(1).numpy()[0]
        np.testing.assert_allclose(out["confidences"][b], o_conf, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# reranker-enabled RAGVT5: pair scoring + sort/threshold/clamp + reordered
# assembly
# ---------------------------------------------------------------------------
def test_rerank_engine_matches_reference_reassembly():
    """Reranker family (src/RAGVT5.py:101-104 + src/_modules.py:1544-1610):
    cross-encoder scores on (question, retrieved text) pairs -> sort desc ->
    threshold filter clamped to [min, max] -> all retrieval lists reordered ->
    concat assembly over the kept ranks. Oracle: HF BertModel encoder +
    shared random classifier head (math restated in numpy), the reference's
    filter transliteration, and HF generate on the re-assembled input.
    include_surroundings=0 — the config under which the engine's pair text
    equals the reference's compacted text exactly (strict mode covered by
    test_build_pair_tokens_surround_matches_reference)."""
    from transformers import BertConfig as HFBertConfig, BertModel
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    from rag_docvqa_tpu.engine.rag_vt5 import RAGVT5Engine
    from rag_docvqa_tpu.engine.reranker import Reranker, RerankerConfig
    from rag_docvqa_tpu.models.bert import BertConfig, convert_bert_state_dict, init_bert_params
    from rag_docvqa_tpu.models.convert import convert_t5_state_dict, torch_state_dict_to_numpy
    from rag_docvqa_tpu.models.embeddings import init_spatial_params

    # --- shared random weights -------------------------------------------
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

    bert_cfg = BertConfig(vocab_size=TOK.vocab_size, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64, max_position_embeddings=128,
                          num_labels=1)
    hf_bert_cfg = HFBertConfig(
        vocab_size=TOK.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=128,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(4)
    hf_bert = BertModel(hf_bert_cfg, add_pooling_layer=False).eval()
    bert_params = convert_bert_state_dict(
        {k: v.numpy() for k, v in hf_bert.state_dict().items()},
        dataclasses.replace(bert_cfg, num_labels=0),
    )
    head = jax.tree.map(np.asarray, init_bert_params(jax.random.PRNGKey(5), bert_cfg))
    bert_params["cls_dense"] = head["cls_dense"]
    bert_params["cls_out"] = head["cls_out"]
    bert_params = jax.tree.map(jnp.asarray, bert_params)

    rag0 = dataclasses.replace(RAG, include_surroundings=0)
    docs = make_corpus(3, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)

    # --- oracle pair scores (HF encoder + numpy head, layout restated) ----
    shared = np.asarray(params["t5"]["shared"])
    PAIR_T, QCAP = 96, 32

    def oracle_pair_scores(doc):
        chunks, topk = oracle_retrieve(doc, shared, rag=rag0)
        rows, masks = [], []
        q_ids = TOK.encode(doc.question)[: CAPS.question_tokens][:QCAP]
        for ci in topk:
            p, widx = chunks[int(ci)]
            text = " ".join(doc.words[p][i] for i in widx)
            c_ids = TOK.encode(text)[: CAPS.embed_tokens]
            ids = [0] + q_ids + [2] + c_ids
            ids = ids[: PAIR_T - 1] + [2]  # final SEP kept (sep2 = min(..., T-1))
            mask = [1] * len(ids) + [0] * (PAIR_T - len(ids))
            rows.append(ids + [0] * (PAIR_T - len(ids)))
            masks.append(mask)
        with torch.no_grad():
            h = hf_bert(
                input_ids=torch.as_tensor(rows), attention_mask=torch.as_tensor(masks)
            ).last_hidden_state.numpy()
        cls = np.tanh(h[:, 0] @ np.asarray(head["cls_dense"]["kernel"]) + np.asarray(head["cls_dense"]["bias"]))
        logit = cls @ np.asarray(head["cls_out"]["kernel"]) + np.asarray(head["cls_out"]["bias"])
        return chunks, topk, 1.0 / (1.0 + np.exp(-logit[:, 0]))

    per_doc = [oracle_pair_scores(d) for d in docs]
    all_scores = np.concatenate([s for _, _, s in per_doc])
    thresh = float(np.median(all_scores))  # exercises filter + clamp branches

    from test_bert_reranker import reference_rerank

    # --- engine with the reranker wired ----------------------------------
    rcfg = RerankerConfig(filter_thresh=thresh, max_chunk_num=2, min_chunk_num=1,
                          pair_len=PAIR_T, question_len=QCAP)
    eng = RAGVT5Engine(rag0, VT5_CFG, params, TOK,
                       reranker=Reranker(rcfg, bert_cfg, bert_params))
    out = eng.inference(batch, aux)

    for b, doc in enumerate(docs):
        chunks, topk, scores = per_doc[b]
        kept = reference_rerank(scores, thresh, rcfg.max_chunk_num, rcfg.min_chunk_num)
        new_topk = np.asarray([topk[i] for i in kept])
        # 1. reordered + clamped page list
        assert out["pred_answer_pages"][b] == [chunks[int(ci)][0] for ci in new_topk]
        # 2. reranked similarities reported in the new order
        np.testing.assert_allclose(
            np.asarray(out["retrieval"]["similarities"][b][: len(kept)]),
            scores[kept], rtol=1e-4, atol=1e-5,
        )
        # 3. generation over the re-assembled concat input
        o_ids, o_boxes, n = oracle_assemble(doc, chunks, new_topk, rag=rag0)
        o_seqs, o_conf = oracle_generate(hf, spatial, o_ids[None], o_boxes[None], [n])
        assert out["pred_answers"][b] == TOK.decode(_truncate(o_seqs[0], TOK.eos_id, TOK.pad_id))
        np.testing.assert_allclose(out["confidences"][b], o_conf[0], rtol=1e-4, atol=1e-5)


def test_build_pair_tokens_surround_matches_reference():
    """Strict parity mode: the pair chunk segment equals the reference's
    compacted retrieval text INCLUDING surroundings (first-cover dedup in
    retrieval rank order, src/_modules.py:2022-2091) — token-for-token, from
    the slot arrays rather than the embed-token cache."""
    from rag_docvqa_tpu.engine.rag_vt5 import retrieve_device
    from rag_docvqa_tpu.engine.reranker import RerankerConfig, build_pair_tokens_surround

    docs = make_corpus(2, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)
    from rag_docvqa_tpu.models import vt5 as vt5m_mod

    params = vt5m_mod.init_vt5_params(jax.random.PRNGKey(0), VT5_CFG)
    ret = retrieve_device(params["t5"]["shared"], batch, k=3)

    S = 2
    cfg = RerankerConfig(pair_len=160, question_len=32,
                         rerank_on_surroundings=True, include_surroundings=S)
    ids, mask = build_pair_tokens_surround(batch, ret.top_k_idx, ret.top_k_valid, cfg)
    ids, mask = np.asarray(ids), np.asarray(mask)

    shared = np.asarray(params["t5"]["shared"])
    K = 3
    for b, doc in enumerate(docs):
        # oracle rank texts with surroundings + dedup, then the pair layout
        o_rows, _ = oracle_context_rows(doc, shared, S)
        q_ids = TOK.encode(doc.question)[: CAPS.question_tokens][:32]
        for r, text in enumerate(o_rows):
            word_ids = []
            for w in text.split():
                word_ids.extend(TOK.encode_word(w)[: CAPS.tokens_per_word])
            want = [0] + q_ids + [2] + word_ids
            want = want[: cfg.pair_len - 1] + [2]
            row = ids[b * K + r][mask[b * K + r]]
            np.testing.assert_array_equal(row, np.asarray(want, np.int32))


# ---------------------------------------------------------------------------
# real-shape golden case: t5-base dims through the concat pipeline
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_concat_engine_t5_base_dims():
    """The tiny-config golden tests leave accumulation order and the flash
    path untested at real shapes; this one runs the concat pipeline at
    t5-base dims (d_model=768, 12+12 layers, S=512) against the same HF
    re-assembly oracle — flash encoder attention explicitly ON (interpret
    kernel off-TPU), so the fused path itself is golden-checked at the
    production shape."""
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, RAGVT5Engine, retrieve_device
    from rag_docvqa_tpu.models import t5 as t5m_mod
    from rag_docvqa_tpu.models import vt5 as vt5m_mod
    from rag_docvqa_tpu.models.convert import convert_t5_state_dict, torch_state_dict_to_numpy
    from rag_docvqa_tpu.models.embeddings import SpatialConfig, init_spatial_params
    from rag_docvqa_tpu.ops.chunking import ChunkSpec
    from rag_docvqa_tpu.ops.gather import assemble_concat
    from test_engine_golden_parity import oracle_generate

    base = t5m_mod.T5Config(vocab_size=TOK.vocab_size, dropout_rate=0.0, flash_encoder=True)
    vt5_cfg = vt5m_mod.VT5Config(
        t5=base, spatial=SpatialConfig(hidden_size=768, dropout_rate=0.0), use_visual=False
    )
    hf_cfg = HFT5Config(
        vocab_size=TOK.vocab_size, d_model=768, d_kv=64, num_heads=12, d_ff=3072,
        num_layers=12, num_decoder_layers=12, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True, decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    t5_params = convert_t5_state_dict(torch_state_dict_to_numpy(hf), base)
    spatial = jax.tree.map(np.asarray, init_spatial_params(jax.random.PRNGKey(3),
                                                           vt5_cfg.spatial))
    params = jax.tree.map(jnp.asarray, {"t5": t5_params, "spatial": spatial})

    rag = dataclasses.replace(RAG, max_source_length=512, max_new_tokens=4)
    docs = make_corpus(2, n_pages=3, words_per_page=30, seed=0)
    ing = DocVQAIngestor(TOK, SPEC, CAPS)
    batch, aux = ing.ingest(docs)

    eng = RAGVT5Engine(rag, vt5_cfg, params, TOK)
    assert eng.vt5_cfg.t5.flash_encoder
    out = eng.inference(batch, aux)

    shared = np.asarray(params["t5"]["shared"])
    ret = retrieve_device(params["t5"]["shared"], batch, k=rag.chunk_num)
    gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, rag.assemble())
    gen_ids = np.asarray(gen.input_ids)
    gen_boxes = np.asarray(gen.input_boxes)

    import test_engine_golden_parity as g1

    for b, doc in enumerate(docs):
        chunks, o_topk = g1.oracle_retrieve(doc, shared, rag=rag)
        k = len(o_topk)
        np.testing.assert_array_equal(np.asarray(ret.top_k_idx)[b, :k], o_topk)
        o_ids, o_boxes, _ = g1.oracle_assemble(doc, chunks, o_topk, rag=rag)
        np.testing.assert_array_equal(gen_ids[b], o_ids)
        np.testing.assert_array_equal(gen_boxes[b], o_boxes)

    lens = [int(np.asarray(gen.attention_mask)[b].sum()) for b in range(len(docs))]
    o_seqs, o_conf = oracle_generate(hf, spatial, gen_ids, gen_boxes, lens)
    # oracle_generate decodes RAG.max_new_tokens (8); compare the engine's 4
    for b in range(len(docs)):
        o_ids = _truncate(o_seqs[b][: rag.max_new_tokens], TOK.eos_id, TOK.pad_id)
        assert out["pred_answers"][b] == TOK.decode(o_ids)
    # f32 accumulation order differs at 768 dims (flash online softmax vs
    # torch): confidence tolerance is looser than the tiny-config cases
    np.testing.assert_allclose(
        np.asarray(out["confidences"]),
        [float(c) for c in _conf_prefix(hf, spatial, gen_ids, gen_boxes, lens, rag.max_new_tokens)],
        rtol=2e-2, atol=2e-3,
    )


def _conf_prefix(hf, spatial, ids, boxes, lens, max_new):
    """HF greedy confidence at an explicit horizon (prod of max softmax over
    the first max_new steps, dropping the final one)."""
    import test_engine_golden_parity as g1

    shared_t = hf.get_input_embeddings().weight
    x_emb = torch.from_numpy(np.asarray(spatial["x_emb"]))
    y_emb = torch.from_numpy(np.asarray(spatial["y_emb"]))
    ln_w = torch.from_numpy(np.asarray(spatial["ln_w"]))
    ln_b = torch.from_numpy(np.asarray(spatial["ln_b"]))
    mk = torch.from_numpy(np.asarray(spatial["matcher"]["kernel"]))
    mb = torch.from_numpy(np.asarray(spatial["matcher"]["bias"]))
    ids_t = torch.from_numpy(ids).long()
    box_t = torch.from_numpy(np.clip(boxes, 0, 1023)).long()
    sem = shared_t[ids_t]
    sp = x_emb[box_t[..., 0]] + y_emb[box_t[..., 1]] + x_emb[box_t[..., 2]] + y_emb[box_t[..., 3]]
    sp = torch.nn.functional.layer_norm(sp, sp.shape[-1:], ln_w, ln_b, eps=1e-12)
    embeds = sem + sp @ mk + mb
    mask = (torch.arange(ids.shape[1])[None, :] < torch.as_tensor(lens)[:, None]).long()
    with torch.no_grad():
        outg = hf.generate(
            inputs_embeds=embeds, attention_mask=mask, max_new_tokens=max_new,
            do_sample=False, num_beams=1, output_scores=True, return_dict_in_generate=True,
        )
    scores = torch.stack(outg.scores, dim=1)[:, : max_new - 1, :]
    return torch.amax(scores.softmax(-1), 2).prod(1).numpy()
