"""Time-series tokenizer + enc-dec model parity vs torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from metatransformer_tpu.core import convert, encoder
from metatransformer_tpu.models import time_series as ts_model
from metatransformer_tpu.tokenizers import time_series as ts_tok

from . import torch_ref


def test_value_embed_matches_torch_circular_conv():
    c_in, d = 7, 16
    torch.manual_seed(0)
    conv = nn.Conv1d(c_in, d, kernel_size=3, padding=1, padding_mode="circular",
                     bias=False)
    params = ts_tok.convert_torch_conv1d(conv.weight.detach().numpy())
    x = np.random.default_rng(0).standard_normal((2, 10, c_in), dtype=np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x).permute(0, 2, 1)).transpose(1, 2).numpy()
    got = np.asarray(ts_tok.value_embed(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_positional_embedding_matches_reference_formula():
    import math

    d, n = 8, 5
    got = np.asarray(ts_tok.positional_embed(d, n))[0]
    pe = torch.zeros(n, d)
    position = torch.arange(0, n).float().unsqueeze(1)
    div_term = (torch.arange(0, d, 2).float() * -(math.log(10000.0) / d)).exp()
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    np.testing.assert_allclose(got, pe.numpy(), rtol=1e-6, atol=1e-6)


def test_temporal_embed_fixed():
    cfg = ts_tok.TimeSeriesConfig(c_in=1, dim=12, embed_type="fixed", freq="h")
    params = ts_tok.init(cfg, jax.random.PRNGKey(0))
    marks = np.zeros((1, 3, 4), np.int64)
    marks[0, :, 0] = [1, 6, 12]  # month
    marks[0, :, 1] = [1, 15, 31]  # day
    marks[0, :, 2] = [0, 3, 6]  # weekday
    marks[0, :, 3] = [0, 12, 23]  # hour
    got = np.asarray(ts_tok.temporal_embed(params, jnp.asarray(marks), cfg))
    tables = {k: np.asarray(v) for k, v in params.items() if k.endswith("_emb")}
    want = (
        tables["month_emb"][marks[0, :, 0]]
        + tables["day_emb"][marks[0, :, 1]]
        + tables["weekday_emb"][marks[0, :, 2]]
        + tables["hour_emb"][marks[0, :, 3]]
    )
    np.testing.assert_allclose(got[0], want, rtol=1e-6, atol=1e-6)


class _TorchDecoderLayer(nn.Module):
    """Clean-room TSLib DecoderLayer semantics for the oracle."""

    def __init__(self, d, heads, d_ff):
        super().__init__()
        self.heads = heads
        self.hd = d // heads
        for pre in ("self", "cross"):
            for proj in ("q", "k", "v", "o"):
                setattr(self, f"{pre}_{proj}", nn.Linear(d, d))
        self.ff1 = nn.Linear(d, d_ff)
        self.ff2 = nn.Linear(d_ff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def attn(self, x, kv, pre, causal):
        b, tq, d = x.shape
        tk = kv.shape[1]
        q = getattr(self, f"{pre}_q")(x).reshape(b, tq, self.heads, self.hd)
        k = getattr(self, f"{pre}_k")(kv).reshape(b, tk, self.heads, self.hd)
        v = getattr(self, f"{pre}_v")(kv).reshape(b, tk, self.heads, self.hd)
        logits = torch.einsum("bthd,bshd->bhts", q * self.hd**-0.5, k)
        if causal:
            tri = torch.tril(torch.ones(tq, tk, dtype=torch.bool))
            logits = logits.masked_fill(~tri, float("-inf"))
        probs = logits.softmax(-1)
        out = torch.einsum("bhts,bshd->bthd", probs, v).reshape(b, tq, d)
        return getattr(self, f"{pre}_o")(out)

    def forward(self, x, cross):
        x = self.norm1(x + self.attn(x, x, "self", True))
        y = x = self.norm2(x + self.attn(x, cross, "cross", False))
        y = self.ff2(nn.functional.gelu(self.ff1(y)))
        return self.norm3(x + y)


def test_decoder_layer_matches_torch():
    d, heads, d_ff = 16, 4, 32
    torch.manual_seed(1)
    layer = _TorchDecoderLayer(d, heads, d_ff).eval()
    # pack torch weights into our layer pytree
    p = {}
    for pre in ("self", "cross"):
        for proj in ("q", "k", "v", "o"):
            lin = getattr(layer, f"{pre}_{proj}")
            p[f"{pre}_{proj}_w"] = jnp.asarray(lin.weight.detach().numpy().T)
            p[f"{pre}_{proj}_b"] = jnp.asarray(lin.bias.detach().numpy())
    p["ff1_w"] = jnp.asarray(layer.ff1.weight.detach().numpy().T)
    p["ff1_b"] = jnp.asarray(layer.ff1.bias.detach().numpy())
    p["ff2_w"] = jnp.asarray(layer.ff2.weight.detach().numpy().T)
    p["ff2_b"] = jnp.asarray(layer.ff2.bias.detach().numpy())
    for n in ("norm1", "norm2", "norm3"):
        ln = getattr(layer, n)
        p[f"{n}_scale"] = jnp.asarray(ln.weight.detach().numpy())
        p[f"{n}_bias"] = jnp.asarray(ln.bias.detach().numpy())

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, d), dtype=np.float32)
    cross = rng.standard_normal((2, 9, d), dtype=np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x), torch.from_numpy(cross)).numpy()
    dcfg = ts_model.DecoderConfig(dim=d, d_ff=d_ff, num_heads=heads, depth=1)
    got = np.asarray(
        ts_model._decoder_layer(
            jnp.asarray(x), jnp.asarray(cross), p, dcfg, jax.lax.Precision.HIGHEST
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _small_model_cfg(task, **kw):
    return ts_model.TimeSeriesModelConfig(
        task=task,
        pred_len=4,
        seq_len=8,
        enc_in=3,
        dec_in=3,
        c_out=3,
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        decoder=ts_model.DecoderConfig(dim=32, d_ff=64, num_heads=4, depth=1),
        **kw,
    )


def test_forecast_shapes():
    cfg = _small_model_cfg("long_term_forecast")
    params = ts_model.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x_enc = jnp.asarray(rng.standard_normal((2, 8, 3), np.float32))
    marks_enc = jnp.asarray(rng.integers(0, 4, (2, 8, 4)).astype(np.int32))
    x_dec = jnp.asarray(rng.standard_normal((2, 6, 3), np.float32))
    marks_dec = jnp.asarray(rng.integers(0, 4, (2, 6, 4)).astype(np.int32))
    out = ts_model.forward(params, x_enc, cfg, marks_enc, x_dec, marks_dec)
    assert out.shape == (2, 4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_imputation_anomaly_classification_shapes():
    rng = np.random.default_rng(0)
    x_enc = jnp.asarray(rng.standard_normal((2, 8, 3), np.float32))
    marks = jnp.asarray(rng.integers(0, 4, (2, 8, 4)).astype(np.int32))

    cfg = _small_model_cfg("imputation")
    out = ts_model.forward(ts_model.init(cfg, jax.random.PRNGKey(0)), x_enc, cfg, marks)
    assert out.shape == (2, 8, 3)

    cfg = _small_model_cfg("anomaly_detection")
    out = ts_model.forward(ts_model.init(cfg, jax.random.PRNGKey(0)), x_enc, cfg)
    assert out.shape == (2, 8, 3)

    cfg = _small_model_cfg("classification", num_classes=5)
    pad_mask = jnp.ones((2, 8), jnp.float32)
    out = ts_model.forward(
        ts_model.init(cfg, jax.random.PRNGKey(0)), x_enc, cfg, pad_mask
    )
    assert out.shape == (2, 5)
