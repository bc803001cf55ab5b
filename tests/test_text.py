"""Text tokenizer: parity vs HuggingFace CLIPTextModelWithProjection
(constructed locally with random weights — no downloads)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metatransformer_tpu.tokenizers import text as text_tok


def _small_cfg():
    return text_tok.TextTokenizerConfig(
        vocab_size=100,
        context_length=16,
        width=32,
        depth=2,
        num_heads=4,
        proj_dim=24,
        target_dim=48,
        eot_token_id=99,
    )


def _hf_model(cfg):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.width,
        intermediate_size=cfg.width * 4,
        num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.context_length,
        projection_dim=cfg.proj_dim,
        eos_token_id=cfg.eot_token_id,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(hf_cfg).eval()


def test_encode_text_matches_hf_clip():
    cfg = _small_cfg()
    model = _hf_model(cfg)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = text_tok.convert_hf_clip_text(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, (3, 16)).astype(np.int64)
    ids[:, 10] = 99  # EOT = highest id; argmax and eos-position agree
    ids[:, 11:] = 0
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).text_embeds.numpy()
    got = np.asarray(text_tok.encode_text(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_padding_and_apply_shape():
    cfg = _small_cfg()
    params = text_tok.init(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 99, (2, 16)))
    out = text_tok.apply(params, ids, cfg)
    assert out.shape == (2, 1, 48)
    emb = text_tok.encode_text(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(out)[:, 0, :24], np.asarray(emb), rtol=1e-6)
    assert np.abs(np.asarray(out)[:, 0, 24:]).max() == 0.0


def test_quick_gelu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    got = np.asarray(text_tok.quick_gelu(x))
    want = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=1e-6)
