"""HF Pix2Struct parity: random tiny checkpoint -> convert -> compare forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import pix2struct as p2s, t5 as t5m

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


TINY = p2s.Pix2StructConfig(
    vision=p2s.P2SVisionConfig(hidden_size=32, num_layers=2, num_heads=4, d_ff=64,
                               patch_dim=768, max_rows=128, max_cols=128),
    text=t5m.T5Config(vocab_size=300, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                      num_encoder_layers=0, num_decoder_layers=2, gated_ffn=True,
                      tie_word_embeddings=False, dropout_rate=0.0),
)


@pytest.fixture(scope="module")
def hf_pair():
    import transformers
    from transformers import Pix2StructForConditionalGeneration

    cfg = transformers.Pix2StructConfig(
        text_config=transformers.Pix2StructTextConfig(
            vocab_size=300, hidden_size=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, dropout_rate=0.0,
        ).to_dict(),
        vision_config=transformers.Pix2StructVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4, d_ff=64,
            patch_embed_hidden_size=768, seq_len=128, dropout_rate=0.0,
            attention_dropout=0.0,
        ).to_dict(),
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = Pix2StructForConditionalGeneration(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, p2s.convert_p2s_state_dict(sd, TINY))
    return hf, params


def _inputs(n=18):
    rng = np.random.RandomState(0)
    flat = rng.rand(2, n, 770).astype(np.float32)
    flat[:, :, 0] = np.repeat(np.arange(1, n // 3 + 1), 3)[None]
    flat[:, :, 1] = np.tile(np.arange(1, 4), n // 3)[None]
    flat[1, 15:] = 0  # padding rows
    mask = (np.abs(flat).sum(-1) != 0).astype(np.float32)
    return flat, mask


def test_vision_encoder_parity(hf_pair):
    hf, params = hf_pair
    flat, mask = _inputs()
    with torch.no_grad():
        want = hf.encoder(
            flattened_patches=torch.from_numpy(flat),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(p2s.vision_encode(params, TINY, jnp.asarray(flat), jnp.asarray(mask)))
    # compare valid rows only
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got[1, :15], want[1, :15], rtol=3e-4, atol=3e-4)


def test_full_forward_parity(hf_pair):
    hf, params = hf_pair
    flat, mask = _inputs()
    dec = np.array([[0, 5, 9], [0, 7, 2]], dtype=np.int64)
    with torch.no_grad():
        want = hf(
            flattened_patches=torch.from_numpy(flat),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.from_numpy(dec),
        ).logits.numpy()
    enc = p2s.vision_encode(params, TINY, jnp.asarray(flat), jnp.asarray(mask))
    got = np.asarray(
        t5m.decode_train(params["text"], TINY.text, jnp.asarray(dec, jnp.int32), enc, jnp.asarray(mask, bool))
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
