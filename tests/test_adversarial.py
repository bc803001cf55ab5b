"""Adversarial suite: attacks break a trained toy model within budget,
majority voting and KL detection behave as specified."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import adversarial as adv


def _toy_model():
    """A trained linear classifier on 2D separable data."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 8)).astype(np.float32) * 0.1
    y = (x[:, 0] > 0).astype(np.int32)
    x[y == 1, 0] += 0.5
    x[y == 0, 0] -= 0.5
    w = jnp.zeros((8, 2))
    b = jnp.zeros(2)
    params = {"w": w, "b": b}
    tx = optax.adam(0.1)
    state = tx.init(params)

    def loss(p, xx, yy):
        logits = xx @ p["w"] + p["b"]
        return optax.softmax_cross_entropy_with_integer_labels(logits, yy).mean()

    for _ in range(100):
        g = jax.grad(loss)(params, jnp.asarray(x), jnp.asarray(y))
        u, state = tx.update(g, state, params)
        params = optax.apply_updates(params, u)
    return params, jnp.asarray(x), jnp.asarray(y)


def _acc(params, x, y):
    logits = x @ params["w"] + params["b"]
    return float((jnp.argmax(logits, -1) == y).mean())


def test_attacks_reduce_accuracy():
    params, x, y = _toy_model()
    assert _acc(params, x, y) > 0.99

    def loss_fn(xx, yy):
        logits = xx @ params["w"] + params["b"]
        return optax.softmax_cross_entropy_with_integer_labels(logits, yy).mean()

    clip = (-5.0, 5.0)
    adv_fgsm = adv.fgsm(loss_fn, x, y, epsilon=0.6, clip=clip)
    assert _acc(params, adv_fgsm, y) < 0.2
    assert float(jnp.abs(adv_fgsm - x).max()) <= 0.6 + 1e-6

    adv_bim = adv.bim(loss_fn, x, y, epsilon=0.6, step=0.2, iters=10, clip=clip)
    assert _acc(params, adv_bim, y) < 0.2
    assert float(jnp.abs(adv_bim - x).max()) <= 0.6 + 1e-6

    adv_pgd = adv.pgd_linf(
        loss_fn, x, y, jax.random.PRNGKey(0), epsilon=0.6, step=0.2, iters=10,
        clip=clip,
    )
    assert _acc(params, adv_pgd, y) < 0.2

    adv_l2 = adv.pgd_l2(loss_fn, x, y, epsilon=2.0, step=0.5, iters=10, clip=clip)
    assert _acc(params, adv_l2, y) < 0.5
    norms = jnp.sqrt(jnp.sum((adv_l2 - x) ** 2, axis=1))
    assert float(norms.max()) <= 2.0 + 1e-4

    adv_bl2 = adv.bim_l2(loss_fn, x, y, epsilon=2.0, step=0.5, iters=10,
                         clip=clip)
    assert _acc(params, adv_bl2, y) < 0.5
    norms = jnp.sqrt(jnp.sum((adv_bl2 - x) ** 2, axis=1))
    assert float(norms.max()) <= 2.0 + 1e-4


def test_cw_l2_minimal_misclassification():
    """CW finds adversarials (acc collapses) with *small* L2 perturbations
    — the minimal-distortion property that distinguishes it from the
    epsilon-ball attacks (attack.py:62-76 uses foolbox
    L2CarliniWagnerAttack(6, 1000, 0.01, 0))."""
    params, x, y = _toy_model()

    def logits_fn(xx):
        return xx @ params["w"] + params["b"]

    adv_cw = adv.cw_l2(
        logits_fn, x, y, binary_search_steps=4, steps=150, stepsize=0.05,
        clip=(-5.0, 5.0),
    )
    assert _acc(params, adv_cw, y) < 0.1
    # perturbations stay finite, in-bounds, and meaningfully small
    assert bool(jnp.all(jnp.isfinite(adv_cw)))
    assert float(adv_cw.min()) >= -5.0 and float(adv_cw.max()) <= 5.0
    norms = jnp.sqrt(jnp.sum((adv_cw - x) ** 2, axis=1))
    assert float(jnp.median(norms)) < 2.0


def test_frobenius_detection_score():
    """Matches a double-loop numpy oracle of frob_norm_kl_matrix; agreeing
    classifiers score ~0, a desynchronized one scores high."""
    rng = np.random.default_rng(0)
    logits = [jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
              for _ in range(3)]
    score = np.asarray(adv.frobenius_detection_score(logits))

    # numpy oracle
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    probs = np.stack([softmax(np.asarray(l)) for l in logits], 1)  # [B,M,C]
    for b in range(4):
        m = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                pi, pj = probs[b, i], probs[b, j]
                m[i, j] = np.sum(pj * (np.log(pj) - np.log(pi)))
        assert abs(score[b] - np.sqrt((m**2).sum())) < 1e-4

    same = [logits[0], logits[0], logits[0]]
    assert float(np.asarray(adv.frobenius_detection_score(same)).max()) < 1e-5
    far = [logits[0], logits[0].at[:, 0].add(8.0), logits[0]]
    assert float(np.asarray(adv.frobenius_detection_score(far)).min()) > 1.0


def test_majority_voting():
    l1 = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
    l2 = jnp.asarray([[0.8, 0.2], [0.9, 0.1]])
    l3 = jnp.asarray([[0.7, 0.3], [0.1, 0.9]])
    votes = adv.majority_voting([l1, l2, l3])
    np.testing.assert_array_equal(np.asarray(votes), [0, 1])


def test_kl_detection_separates_adversarials():
    """SEViT mechanism: the attack targets the final head; an auxiliary
    classifier on a DIFFERENT representation (here: a disjoint feature
    subset, mimicking an intermediate block) stays unfooled, so the
    head-vs-block KL spikes on adversarial inputs."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 8)).astype(np.float32) * 0.1
    y = (rng.uniform(size=256) > 0.5).astype(np.int32)
    sign = np.where(y == 1, 0.6, -0.6).astype(np.float32)
    x[:, 0] += sign  # signal visible to the head
    x[:, 4] += sign  # duplicate signal visible only to the block classifier
    x, y = jnp.asarray(x), jnp.asarray(y)

    def train(feature_slice):
        params = {"w": jnp.zeros((8, 2)), "b": jnp.zeros(2)}
        mask = np.zeros((8, 1), np.float32)
        mask[feature_slice] = 1.0
        mask = jnp.asarray(mask)

        def logits_fn(p, xx):
            return (xx * mask[:, 0]) @ p["w"] + p["b"]

        tx = optax.adam(0.1)
        state = tx.init(params)

        def loss(p):
            lg = logits_fn(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

        for _ in range(100):
            g = jax.grad(loss)(params)
            u, state = tx.update(g, state, params)
            params = optax.apply_updates(params, u)
        return params, logits_fn

    head_p, head_fn = train(slice(0, 4))
    block_p, block_fn = train(slice(4, 8))

    def loss_fn(xx, yy):
        return optax.softmax_cross_entropy_with_integer_labels(
            head_fn(head_p, xx), yy
        ).mean()

    x_adv = adv.pgd_linf(
        loss_fn, x, y, jax.random.PRNGKey(1), epsilon=0.7, step=0.2, iters=10,
        clip=(-5, 5),
    )
    # attack succeeded on the head but not the block classifier
    assert float((jnp.argmax(head_fn(head_p, x_adv), -1) == y).mean()) < 0.3
    assert float((jnp.argmax(block_fn(block_p, x_adv), -1) == y).mean()) > 0.7

    clean_scores = np.asarray(
        adv.detection_score(head_fn(head_p, x), [block_fn(block_p, x)])
    )
    adv_scores = np.asarray(
        adv.detection_score(head_fn(head_p, x_adv), [block_fn(block_p, x_adv)])
    )
    scores = np.concatenate([clean_scores, adv_scores])
    is_adv = np.r_[np.zeros(len(x), bool), np.ones(len(x), bool)]
    _, _, auc = adv.roc_curve(scores, is_adv)
    assert auc > 0.8, auc
