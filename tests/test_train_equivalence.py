"""Torch-twin training equivalence: the strongest offline accuracy proxy.

Encoder parity (test_encoder_parity.py) certifies the *forward*; this
certifies the *training loop* — optimizer, LR schedule, weight decay and
loss numerics end-to-end — the way the reference's engines do it
(``/root/reference/Audio/src/traintest.py:20-365``: AdamW + scheduler +
CE over a frozen/partially-frozen model).

Protocol: one frozen-encoder recipe at tabular/audio-like geometry
(linear feature embed -> shared encoder [frozen] -> mean pool -> linear
head) is initialized from the SAME torch weights on both sides and
trained for 200 steps on identical synthetic data with AdamW + cosine
warmup schedule:

- torch: ``torch.optim.AdamW`` + ``LambdaLR`` carrying the exact optax
  schedule semantics (linear warmup then cosine decay, written out
  below), fp32.
- here: ``train.step.make_train_step`` + ``train.optim.make_optimizer``
  + ``train.schedules.cosine_with_warmup`` — the real production path.

The per-step loss curves must match within fp32 accumulation noise for
all 200 steps. A wrong decoupled-weight-decay placement, schedule
off-by-one, bias-correction or CE-reduction mismatch all blow past the
tolerance within a few dozen steps.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from metatransformer_tpu.core import convert, encoder
from metatransformer_tpu.train import optim as optim_lib
from metatransformer_tpu.train import schedules
from metatransformer_tpu.train import step as step_lib

from . import torch_ref

DIM, DEPTH, HEADS = 64, 2, 2
FEAT, T, CLASSES, BATCH = 24, 12, 10, 16
STEPS, WARMUP, BASE_LR, WD = 200, 20, 5e-3, 0.05
MIN_LR = WARMUP_INIT = 1e-6


def _sched_value(step: int) -> float:
    """optax cosine_with_warmup semantics, written out independently so a
    schedule bug in schedules.py cannot self-certify."""
    if step < WARMUP:
        return WARMUP_INIT + (BASE_LR - WARMUP_INIT) * step / WARMUP
    alpha = MIN_LR / BASE_LR
    frac = min((step - WARMUP) / max(STEPS - WARMUP, 1), 1.0)
    return BASE_LR * ((1 - alpha) * 0.5 * (1 + math.cos(math.pi * frac)) + alpha)


class _TorchTwin(torch.nn.Module):
    def __init__(self, seed: int):
        super().__init__()
        torch.manual_seed(seed)
        self.embed = torch.nn.Linear(FEAT, DIM)
        self.blocks = torch_ref.make_encoder(DIM, DEPTH, HEADS, seed=seed + 1)
        self.head = torch.nn.Linear(DIM, CLASSES)
        for p in self.blocks.parameters():  # frozen-encoder recipe
            p.requires_grad_(False)

    def forward(self, x):
        h = self.blocks(self.embed(x))
        return self.head(h.mean(dim=1))


def _jax_params(twin: _TorchTwin):
    # np.array(...) copies: .detach().numpy() shares storage with the torch
    # parameter and jnp.asarray can alias host memory on CPU, so without the
    # copy torch's in-place opt.step() would silently mutate the JAX weights.
    snap = lambda t: np.array(t.detach().numpy(), dtype=np.float32)
    enc_state = {k: snap(v) for k, v in twin.blocks.state_dict().items()}
    return {
        "encoder": {
            k: jnp.asarray(v) for k, v in convert.convert_state_dict(enc_state).items()
        },
        "tok": {
            "w": jnp.asarray(snap(twin.embed.weight).T),
            "b": jnp.asarray(snap(twin.embed.bias)),
        },
        "head": {
            "w": jnp.asarray(snap(twin.head.weight).T),
            "b": jnp.asarray(snap(twin.head.bias)),
        },
    }


def _make_data(seed: int):
    rng = np.random.default_rng(seed)
    xs = rng.standard_normal((10, BATCH, T, FEAT), dtype=np.float32)
    # Learnable labels: a fixed random linear probe of the mean feature —
    # the loss must visibly drop, so the curves can't agree by standing still.
    probe = rng.standard_normal((FEAT, CLASSES), dtype=np.float32)
    ys = np.argmax(xs.mean(axis=2) @ probe, axis=-1).astype(np.int64)
    return xs, ys


def _train_torch(twin: _TorchTwin, xs, ys):
    trainable = [p for p in twin.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(
        trainable, lr=1.0, betas=(0.9, 0.999), eps=1e-8, weight_decay=WD
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda k: _sched_value(k))
    losses = []
    for s in range(STEPS):
        x = torch.from_numpy(xs[s % len(xs)])
        y = torch.from_numpy(ys[s % len(ys)])
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(twin(x), y)
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _train_jax(params, xs, ys):
    cfg = encoder.EncoderConfig(dim=DIM, depth=DEPTH, num_heads=HEADS, attn_impl="xla")

    def forward(p, x, rng):
        h = x @ p["tok"]["w"] + p["tok"]["b"]
        h = encoder.encode(p["encoder"], h, cfg)
        return h.mean(axis=1) @ p["head"]["w"] + p["head"]["b"]

    tx = optim_lib.make_optimizer(
        "adamw",
        lr=schedules.cosine_with_warmup(BASE_LR, STEPS, WARMUP, MIN_LR, WARMUP_INIT),
        weight_decay=WD,
    )
    train_step = jax.jit(step_lib.make_train_step(forward, tx))
    trainable, frozen = step_lib.split_params(params)
    opt_state = tx.init(trainable)
    losses = []
    for s in range(STEPS):
        batch = {
            "input": jnp.asarray(xs[s % len(xs)]),
            "label": jnp.asarray(ys[s % len(ys)].astype(np.int32)),
        }
        trainable, opt_state, metrics = train_step(
            trainable, frozen, opt_state, batch, None
        )
        losses.append(float(metrics["loss"]))
    return np.asarray(losses)


@pytest.mark.fast
def test_frozen_encoder_training_matches_torch():
    twin = _TorchTwin(seed=0)
    params = _jax_params(twin)
    xs, ys = _make_data(seed=1)

    with torch.no_grad():
        want0 = twin(torch.from_numpy(xs[0])).numpy()
    # forward parity at init — catches wiring bugs before blaming the optimizer
    cfg = encoder.EncoderConfig(dim=DIM, depth=DEPTH, num_heads=HEADS, attn_impl="xla")
    h = jnp.asarray(xs[0]) @ params["tok"]["w"] + params["tok"]["b"]
    got0 = np.asarray(
        encoder.encode(params["encoder"], h, cfg).mean(axis=1)
        @ params["head"]["w"] + params["head"]["b"]
    )
    np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=1e-4)

    t_losses = _train_torch(twin, xs, ys)
    j_losses = _train_jax(params, xs, ys)

    # Both must actually learn (not two broken loops agreeing on nothing).
    assert t_losses[-1] < 0.5 * t_losses[0], t_losses[[0, -1]]
    # Loss curves match step-for-step within fp32 accumulation noise.
    tol = 1e-3 + 2e-3 * np.abs(t_losses)
    diff = np.abs(j_losses - t_losses)
    worst = int(np.argmax(diff - tol))
    assert (diff <= tol).all(), (
        f"step {worst}: jax {j_losses[worst]:.6f} vs torch {t_losses[worst]:.6f} "
        f"(diff {diff[worst]:.2e}, tol {tol[worst]:.2e})"
    )
