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


def bim_l2(loss_fn: LossFn, inputs, labels, epsilon: float = 1.0,
           step: float = 0.2, iters: int = 10, clip=(0.0, 1.0)):
    """L2 basic iterative method — the reference's "BIM" is foolbox's
    *L2*BasicIterativeAttack (attack.py:96); gradient normalized to unit
    L2, delta projected onto the epsilon ball, no random start."""
    grad = _loss_grad(loss_fn)
    axes = tuple(range(1, inputs.ndim))

    def body(_, adv):
        g = grad(adv, labels)
        n = jnp.sqrt(jnp.sum(g**2, axis=axes, keepdims=True))
        adv = adv + step * g / jnp.maximum(n, 1e-12)
        delta = adv - inputs
        dn = jnp.sqrt(jnp.sum(delta**2, axis=axes, keepdims=True))
        delta = delta * jnp.minimum(1.0, epsilon / jnp.maximum(dn, 1e-12))
        return jnp.clip(inputs + delta, *clip)

    return jax.lax.fori_loop(0, iters, body, inputs)


def bim(loss_fn: LossFn, inputs, labels, epsilon: float = 0.03,
        step: float = 0.01, iters: int = 10, clip=(0.0, 1.0)):
    """Basic iterative method (Linf, no random start) — the reference's
    "LinfBIM" (attack.py:137 LinfBasicIterativeAttack)."""
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


def cw_l2(logits_fn: Callable[[jax.Array], jax.Array], inputs, labels,
          binary_search_steps: int = 6, steps: int = 1000,
          stepsize: float = 0.01, confidence: float = 0.0,
          initial_const: float = 1e-3, clip=(0.0, 1.0)):
    """Carlini & Wagner L2 attack (X-Ray/attack.py:75
    ``fb.attacks.L2CarliniWagnerAttack(6, 1000, 0.01, 0)``).

    Untargeted: minimize ||x_adv - x||^2 + c * f(x_adv) with
    f = max(Z_y - max_{i != y} Z_i, -confidence), optimizing over the tanh
    reparameterization w (x_adv = lo + (hi-lo) * (tanh(w)+1)/2) with Adam,
    binary-searching the trade-off constant c per sample. Unlike the
    epsilon-ball attacks above this takes the *logits* fn, since the CW
    objective needs the margin, not a scalar loss.
    """
    lo, hi = clip
    x0 = jnp.asarray(inputs)
    b = x0.shape[0]
    onehot = jax.nn.one_hot(labels, logits_fn(x0).shape[-1])
    axes = tuple(range(1, x0.ndim))
    # inverse of the tanh reparam at the clean input (eps keeps atanh finite)
    t = jnp.clip((x0 - lo) / (hi - lo) * 2.0 - 1.0, -1 + 1e-6, 1 - 1e-6)
    w0 = jnp.arctanh(t)

    def to_x(w):
        return lo + (hi - lo) * (jnp.tanh(w) + 1.0) * 0.5

    def margin(logits):
        z_true = jnp.sum(logits * onehot, -1)
        z_other = jnp.max(logits - 1e9 * onehot, -1)
        return z_true - z_other  # <0 means misclassified

    def objective(w, c):
        x = to_x(w)
        l2 = jnp.sum((x - x0) ** 2, axis=axes)
        f = jnp.maximum(margin(logits_fn(x)), -confidence)
        return jnp.sum(l2 + c * f), (x, l2)

    grad_fn = jax.grad(objective, has_aux=True)
    b1, b2, eps_adam = 0.9, 0.999, 1e-8

    @jax.jit
    def optimize(c):
        def body(i, st):
            w, m, v, best_x, best_l2 = st
            g, (x, l2) = grad_fn(w, c)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mh = m / (1 - b1 ** (i + 1.0))
            vh = v / (1 - b2 ** (i + 1.0))
            w = w - stepsize * mh / (jnp.sqrt(vh) + eps_adam)
            adv = margin(logits_fn(x)) < 0
            better = adv & (l2 < best_l2)
            bc = better.reshape((-1,) + (1,) * (x.ndim - 1))
            return (w, m, v, jnp.where(bc, x, best_x),
                    jnp.where(better, l2, best_l2))

        z = jnp.zeros_like(w0)
        init = (w0, z, z, x0, jnp.full((b,), jnp.inf))
        _, _, _, best_x, best_l2 = jax.lax.fori_loop(0, steps, body, init)
        return best_x, best_l2

    c_lo = np.zeros(b)
    c_hi = np.full(b, 1e10)
    c = np.full(b, initial_const)
    overall_x, overall_l2 = np.array(x0), np.full(b, np.inf)
    for _ in range(binary_search_steps):
        best_x, best_l2 = jax.device_get(optimize(jnp.asarray(c)))
        found = np.isfinite(best_l2)
        better = found & (best_l2 < overall_l2)
        overall_x[better] = best_x[better]
        overall_l2[better] = best_l2[better]
        # success -> try smaller c (favor distance); failure -> raise c
        c_hi = np.where(found, c, c_hi)
        c_lo = np.where(found, c_lo, c)
        c = np.where(c_hi < 1e10, (c_lo + c_hi) / 2.0, c * 10.0)
    return jnp.asarray(overall_x)


ATTACKS = {"fgsm": fgsm, "bim": bim, "bim_l2": bim_l2, "pgd": pgd_linf,
           "pgd_l2": pgd_l2, "cw": cw_l2}


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


def frobenius_detection_score(logit_list: Sequence[jax.Array]) -> jax.Array:
    """SEViT's second detection score (X-Ray/utils.py:97-107
    ``frob_norm_kl_matrix``): per sample, the Frobenius norm of the
    (M+1)x(M+1) matrix of pairwise KL divergences between the final head
    and every intermediate-block classifier — clean inputs agree
    everywhere (near-zero matrix), attacks desynchronize it."""
    logps = jnp.stack(
        [jax.nn.log_softmax(l, -1) for l in logit_list], axis=1
    )  # [B, M, C]
    p = jnp.exp(logps)
    # div[b, i, j] = KL(p_j || p_i)  (kl_div(input=log p_i, target=log p_j))
    div = jnp.sum(
        p[:, None, :, :] * (logps[:, None, :, :] - logps[:, :, None, :]),
        axis=-1,
    )
    return jnp.sqrt(jnp.sum(div**2, axis=(1, 2)))


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
