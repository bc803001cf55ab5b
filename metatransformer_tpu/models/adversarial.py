"""Adversarial robustness suite (X-Ray subproject parity).

Reference: ``X-Ray/attack.py:6-176`` (foolbox FGSM / BIM / PGD / L2PGD
attacks), ``X-Ray/majority_voting.py:11`` (ensemble of MLP classifiers on
intermediate encoder blocks + majority vote), and
``X-Ray/adversarial_detection.py`` + ``utils.py:97-148`` (KL /
Frobenius-distance detection of adversarial inputs).

All attacks are white-box gradient attacks expressed with jax.grad over
the jitted model — no external attack library needed.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LossFn = Callable[[jax.Array, jax.Array], jax.Array]  # (inputs, labels) -> scalar


def _loss_grad(loss_fn: LossFn):
    return jax.grad(lambda x, y: loss_fn(x, y))


def fgsm(loss_fn: LossFn, inputs, labels, epsilon: float = 0.03,
         clip=(0.0, 1.0)):
    """Fast gradient sign method."""
    g = _loss_grad(loss_fn)(inputs, labels)
    adv = inputs + epsilon * jnp.sign(g)
    return jnp.clip(adv, *clip)


def bim(loss_fn: LossFn, inputs, labels, epsilon: float = 0.03,
        step: float = 0.01, iters: int = 10, clip=(0.0, 1.0)):
    """Basic iterative method (Linf, no random start)."""
    grad = _loss_grad(loss_fn)

    def body(_, adv):
        g = grad(adv, labels)
        adv = adv + step * jnp.sign(g)
        adv = jnp.clip(adv, inputs - epsilon, inputs + epsilon)
        return jnp.clip(adv, *clip)

    return jax.lax.fori_loop(0, iters, body, inputs)


def pgd_linf(loss_fn: LossFn, inputs, labels, rng, epsilon: float = 0.03,
             step: float = 0.01, iters: int = 10, clip=(0.0, 1.0)):
    """PGD: BIM with a uniform random start inside the Linf ball."""
    start = inputs + jax.random.uniform(
        rng, inputs.shape, minval=-epsilon, maxval=epsilon
    )
    start = jnp.clip(start, *clip)
    grad = _loss_grad(loss_fn)

    def body(_, adv):
        g = grad(adv, labels)
        adv = adv + step * jnp.sign(g)
        adv = jnp.clip(adv, inputs - epsilon, inputs + epsilon)
        return jnp.clip(adv, *clip)

    return jax.lax.fori_loop(0, iters, body, start)


def pgd_l2(loss_fn: LossFn, inputs, labels, epsilon: float = 1.0,
           step: float = 0.2, iters: int = 10, clip=(0.0, 1.0)):
    """L2 projected gradient descent."""
    grad = _loss_grad(loss_fn)
    axes = tuple(range(1, inputs.ndim))

    def normalize(g):
        n = jnp.sqrt(jnp.sum(g**2, axis=axes, keepdims=True))
        return g / jnp.maximum(n, 1e-12)

    def body(_, adv):
        g = grad(adv, labels)
        adv = adv + step * normalize(g)
        delta = adv - inputs
        dn = jnp.sqrt(jnp.sum(delta**2, axis=axes, keepdims=True))
        delta = delta * jnp.minimum(1.0, epsilon / jnp.maximum(dn, 1e-12))
        return jnp.clip(inputs + delta, *clip)

    return jax.lax.fori_loop(0, iters, body, inputs)


ATTACKS = {"fgsm": fgsm, "bim": bim, "pgd": pgd_linf, "pgd_l2": pgd_l2}


def majority_voting(logit_list: Sequence[jax.Array]) -> jax.Array:
    """Majority vote over per-block classifier logits
    (``majority_voting.py:11``): each member votes its argmax; ties go to
    the lowest class id (torch mode semantics). -> [B] predictions."""
    votes = jnp.stack([jnp.argmax(l, -1) for l in logit_list], axis=1)  # [B, M]
    n_cls = logit_list[0].shape[-1]
    counts = jax.vmap(lambda v: jnp.bincount(v, length=n_cls))(votes)
    return jnp.argmax(counts, axis=-1)


def kl_divergence(p_logits: jax.Array, q_logits: jax.Array) -> jax.Array:
    """KL(p || q) per sample from logits (adversarial_detection metric)."""
    p = jax.nn.softmax(p_logits, -1)
    logp = jax.nn.log_softmax(p_logits, -1)
    logq = jax.nn.log_softmax(q_logits, -1)
    return jnp.sum(p * (logp - logq), axis=-1)


def detection_score(
    head_logits: jax.Array, block_logits: Sequence[jax.Array]
) -> jax.Array:
    """Adversarial-detection score: mean KL between the final head and the
    intermediate-block classifiers (clean inputs agree; attacks targeting
    the final head leave the early blocks behind -> high KL)."""
    kls = [kl_divergence(head_logits, bl) for bl in block_logits]
    return jnp.mean(jnp.stack(kls, axis=0), axis=0)


def roc_curve(scores: np.ndarray, is_adv: np.ndarray, n_thresholds: int = 100):
    """(fpr, tpr, auc) for the detection score (utils.py ROC report)."""
    thr = np.quantile(scores, np.linspace(0, 1, n_thresholds))
    tpr, fpr = [], []
    for t in thr[::-1]:
        pred = scores >= t
        tp = np.sum(pred & is_adv)
        fp = np.sum(pred & ~is_adv)
        tpr.append(tp / max(is_adv.sum(), 1))
        fpr.append(fp / max((~is_adv).sum(), 1))
    auc = float(np.trapezoid(tpr, fpr))
    return np.asarray(fpr), np.asarray(tpr), auc
