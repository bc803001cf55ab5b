"""ms-deform-attn vs torch grid_sample oracle (the reference's own
fallback algorithm, ``ops/functions/ms_deform_attn_func.py:49``),
replicated here in torch as the numerical reference — same test design
as the reference's ``ops/test.py`` CUDA-vs-fallback checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from metatransformer_tpu.ops import ms_deform_attn as msda


def _torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Clean-room grid_sample implementation of the fallback algorithm."""
    b, _, h, dh = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    splits = [hh * ww for hh, ww in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    out = []
    for li, (hl, wl) in enumerate(spatial_shapes):
        vl = value_list[li].flatten(2).transpose(1, 2).reshape(b * h, dh, hl, wl)
        g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)[:, None]  # [B*H,1,Lq,P,2]
        g = g.squeeze(1)  # [B*H, Lq, P, 2]
        sampled = F.grid_sample(
            vl, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [B*H, Dh, Lq, P]
        out.append(sampled)
    attn = attention_weights.transpose(1, 2).reshape(b * h, 1, lq, l * p)
    stacked = torch.stack(out, dim=-2).flatten(-2)  # [B*H, Dh, Lq, L*P]
    res = (stacked * attn).sum(-1).view(b, h * dh, lq)
    return res.transpose(1, 2).contiguous()


def _rand_inputs(rng, b=2, lq=5, h=2, dh=4, shapes=((6, 8), (3, 4)), p=3):
    l = len(shapes)
    s = sum(hh * ww for hh, ww in shapes)
    value = rng.standard_normal((b, s, h, dh)).astype(np.float32)
    loc = rng.uniform(0.05, 0.95, (b, lq, h, l, p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (b, lq, h, l, p)).astype(np.float32)
    w = w / w.sum((-2, -1), keepdims=True)
    return value, loc, w


def test_core_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    shapes = ((6, 8), (3, 4))
    value, loc, w = _rand_inputs(rng, shapes=shapes)
    with torch.no_grad():
        want = _torch_oracle(
            torch.from_numpy(value), shapes,
            torch.from_numpy(loc), torch.from_numpy(w),
        ).numpy()
    got = np.asarray(
        msda.ms_deform_attn_core(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_core_out_of_bounds_zero_padding():
    rng = np.random.default_rng(1)
    shapes = ((4, 4),)
    value, _, w = _rand_inputs(rng, shapes=shapes, p=1)
    # all locations far outside -> zero output
    loc = np.full((2, 5, 2, 1, 1, 2), 3.0, np.float32)
    out = np.asarray(
        msda.ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                                 jnp.asarray(w[..., :1]))
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_core_gradients_flow():
    rng = np.random.default_rng(2)
    shapes = ((4, 4), (2, 2))
    value, loc, w = _rand_inputs(rng, shapes=shapes)

    def loss(v, locs, wgt):
        return jnp.sum(
            msda.ms_deform_attn_core(v, shapes, locs, wgt) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).max()) > 0


def test_module_forward():
    cfg = msda.MSDeformAttnConfig(dim=32, num_heads=4, num_levels=2, num_points=3)
    params = msda.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    shapes = ((4, 4), (2, 2))
    s = sum(h * w for h, w in shapes)
    query = jnp.asarray(rng.standard_normal((2, 6, 32), np.float32))
    refp = jnp.asarray(rng.uniform(0.2, 0.8, (2, 6, 2, 2)).astype(np.float32))
    tokens = jnp.asarray(rng.standard_normal((2, s, 32), np.float32))
    out = msda.apply(params, query, refp, tokens, shapes, cfg)
    assert out.shape == (2, 6, 32)
    assert np.isfinite(np.asarray(out)).all()
