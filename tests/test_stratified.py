"""Stratified Transformer: window/stratified mask semantics, forward
shape, and end-to-end overfit (reference:
openpoints/models/backbone/Stratified_transformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import stratified_transformer as st


TINY = st.StratifiedConfig(
    num_classes=5, in_channels=3,
    channels=(8, 8, 16), depths=(1, 1, 2), num_heads=(1, 2, 2),
    window_size=0.5, quant_size=0.125, k=8, n_kernel_pts=5,
)


def _points(b=2, n=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n, 3)) * 0.5, jnp.float32)


def test_window_masks_semantics():
    """Fine-window pairs always attend; cross-fine-window pairs attend
    only when the key is a downsampled point sharing the coarse window
    (get_indice_pairs:13-45)."""
    ws = 1.0
    # 4 points: p0,p1 in fine window (0,0,0); p2 in fine (1,0,0) — same
    # coarse (0,0,0) as p0/p1; p3 far away in another coarse window.
    xyz = jnp.asarray([[[0.1, 0.1, 0.1], [0.4, 0.2, 0.3],
                        [1.2, 0.1, 0.1], [3.5, 3.5, 3.5]]])
    down = jnp.asarray([[True, False, True, True]])
    m = np.asarray(st._window_masks(xyz, ws, False, down)[0])
    # fine pairs + self
    assert m[0, 1] and m[1, 0] and m[0, 0] and m[2, 2]
    # stratified: p0 -> p2 allowed (p2 downsampled, same coarse, diff fine)
    assert m[0, 2] and m[1, 2]
    # p2 -> p1 NOT allowed (p1 not downsampled)
    assert not m[2, 1]
    # p2 -> p0 allowed (p0 downsampled, same coarse window)
    assert m[2, 0]
    # p3 isolated from everyone but itself
    assert m[3, 3] and not m[0, 3] and not m[3, 0]


def test_forward_shape_and_finite():
    params = st.init(TINY, jax.random.PRNGKey(0))
    pts = _points()
    out = st.forward(params, pts, TINY)
    assert out.shape == (2, 64, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_overfit_plane_split():
    """Plane-split seg task (the randlanet/baafnet bar): loss < 0.15 in
    80 steps; gradients reach the cRPE tables and the KPConv stem."""
    params = st.init(TINY, jax.random.PRNGKey(0))
    pts = _points(b=2, n=64, seed=3)
    labels = jnp.asarray((np.asarray(pts)[..., 2] > 0).astype(np.int64))

    def loss_fn(p):
        logits = st.forward(p, pts, TINY)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    g0 = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g0["stages"][0][0]["attn"]["rel_q"]).max()) > 0
    assert float(jnp.abs(g0["stem"]["kp1"]["w"]).max()) > 0

    tx = optax.adam(5e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(80):
        params, state, loss = step(params, state)
    assert float(loss) < 0.15
