"""Recipe builders: every shipped config YAML -> (params, forward, synthetic
data) ready for the unified Trainer.

This is the L5 launcher surface the reference spreads over per-subproject
entries (``Image/segmentation/train.py:100-207``,
``AutonomousDriving/tools/train.py:60-144``, ``Time-Series/run.py:109-118``,
``Video/run_class_finetuning.py:406``, ``Audio/src/run.py:120-178``, the
fairseq-train Graph recipe, ``Tabular/run_experiments/adult/
adult_meta-transformer.py:103-161``, ``Hyper-spectrum/train.py``) — here one
registry keyed by (modality, task, model NAME).

Every builder has two geometry modes:
- full (default): the YAML's published recipe geometry;
- smoke (``--smoke``): tiny-but-structurally-identical geometry so any
  recipe trains a step on CPU in seconds — the TPU-native answer to the
  reference's "no CI" gap (SURVEY.md §4).

Synthetic data stands in for the real loaders when ``--data`` is absent, so
``python -m metatransformer_tpu.train_cli --cfg <any yaml> --smoke`` is
always executable in this environment.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc


@dataclasses.dataclass
class Recipe:
    """What a builder hands the CLI.

    ``forward(params, batch_input, rng)`` returns class logits for
    classification recipes (loss_fn applies CE/BCE/...) or the scalar
    training loss directly for structured tasks (loss_fn is identity).
    """

    params: Dict[str, Any]
    forward: Callable
    synth: Callable  # (batch_size, n_batches, seed) -> iterable of batches
    loss_fn: Optional[Callable] = None  # None -> cross-entropy
    classification: bool = True  # drives val loop + accuracy metric
    jit_step: bool = True  # False: loss has host-side stages (Hungarian)
    best_mode: str = "max"
    # task-specific --eval protocol: (params, forward, batches) -> metrics
    # dict (e.g. ShapeNetPart ins/cls-mIoU); None -> accuracy/mean-loss.
    eval_metric: Optional[Callable] = None
    # real-data loader factory: (data_path, batch_size, seed, train) ->
    # iterable of batches. Set by recipes that ingest raw files on disk
    # (image: JPEG trees/manifests via data/image_folder.py); the CLI's
    # --data switches from synth to this.
    data_loader: Optional[Callable] = None


def _identity_loss(out, _label):
    return out


def _encoder_cfg(cfg, smoke: bool, num_heads: Optional[int] = None):
    if smoke:
        return enc.EncoderConfig(dim=64, depth=2, num_heads=num_heads or 4)
    if cfg.encoder.scale == "large":
        base = enc.LARGE
    elif cfg.encoder.scale == "tiny":
        base = enc.EncoderConfig(dim=64, depth=2, num_heads=4)
    else:
        base = enc.BASE
    if num_heads:
        base = dataclasses.replace(base, num_heads=num_heads)
    return base


def _labels(rng, n, num_classes):
    return jnp.asarray(rng.integers(0, num_classes, n))


# ---------------------------------------------------------------------------
# Classification modalities (logits + integer labels)
# ---------------------------------------------------------------------------


def build_image(cfg, key, smoke=False):
    """ImageNet-style classification (Image/README.md recipes; also the
    X-Ray classifier — SEViT's timm ViT with frozen Meta-T blocks,
    ``X-Ray/train.py:109-131``)."""
    from metatransformer_tpu.models import image_classifier
    from metatransformer_tpu.tokenizers import image as image_tok

    if cfg.model.get("moe"):
        return _build_image_moe(cfg, key, smoke)
    ecfg = _encoder_cfg(cfg, smoke)
    tok = cfg.model.get("tokenizer", {})
    patch = tok.get("patch_size", 16)  # 14 on the L14 track
    img = 2 * patch if smoke else tok.get("img_size", 224)
    mcfg = image_classifier.ImageClassifierConfig(
        tokenizer=image_tok.ImageTokenizerConfig(
            img_size=img, patch_size=patch, dim=ecfg.dim
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
    )
    params = image_classifier.init(mcfg, key)

    def forward(p, x, rng):
        return image_classifier.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, img, img, 3)), jnp.float32
                ),
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    def data_loader(data_path, batch_size, seed, train):
        # raw JPEG/PNG tree or manifest -> uint8 batches; /255 scaling
        # happens on-device in the tokenizer (tokenizers/image.py:70-76)
        from metatransformer_tpu.data.image_folder import ImageFolderLoader

        return ImageFolderLoader(
            data_path, batch_size, img_size=img, train=train, seed=seed,
            workers=int(cfg.train.get("data_workers", 4)),
        )

    return Recipe(params, forward, synth, data_loader=data_loader)


def _build_image_moe(cfg, key, smoke=False):
    """ImageNet classification over the Switch-MoE encoder variant
    (``core/moe_encoder``): ``model.moe: {every: k, n_experts: n}`` turns
    the MoE capacity path into a product surface. Beyond-reference (the
    reference has no mixture-of-experts — SURVEY §2.12 EP row); pairs with
    ``parallel/moe.make_expert_parallel_moe`` for EP sharding (asserted in
    ``__graft_entry__.dryrun_multichip``).

    Training loss = cross-entropy + the Switch load-balance aux loss, so
    the recipe uses the structured-loss path (loss_fn consumes the
    (logits, aux) pair forward returns).
    """
    from metatransformer_tpu.core import moe_encoder as moe_enc
    from metatransformer_tpu.heads import cls as cls_head
    from metatransformer_tpu.tokenizers import image as image_tok
    from metatransformer_tpu.train import step as step_lib

    m = cfg.model.moe
    n_experts = int(m.get("n_experts", 4))
    every = int(m.get("every", 2))
    if smoke:
        ecfg = moe_enc.MoEEncoderConfig(
            dim=64, depth=2, num_heads=4,
            n_experts=min(n_experts, 2), moe_every=every,
        )
    else:
        base = _encoder_cfg(cfg, smoke)
        ecfg = moe_enc.MoEEncoderConfig(
            dim=base.dim, depth=base.depth, num_heads=base.num_heads,
            n_experts=n_experts, moe_every=every,
            capacity_factor=float(m.get("capacity_factor", 1.25)),
        )
    tok = cfg.model.get("tokenizer", {})
    patch = tok.get("patch_size", 16)
    img = 2 * patch if smoke else tok.get("img_size", 224)
    tcfg = image_tok.ImageTokenizerConfig(
        img_size=img, patch_size=patch, dim=ecfg.dim
    )
    hcfg = cls_head.ClsHeadConfig(
        in_dim=ecfg.dim, num_classes=cfg.model.num_classes
    )
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "tokenizer": image_tok.init(tcfg, k1),
        "encoder": moe_enc.init(ecfg, k2),
        "cls_token": jax.random.normal(k3, (1, 1, ecfg.dim)) * 0.02,
        "pos_embed": (
            jax.random.normal(k4, (1, tcfg.num_patches + 1, ecfg.dim)) * 0.02
        ),
        "norm_scale": jnp.ones((ecfg.dim,), jnp.float32),
        "norm_bias": jnp.zeros((ecfg.dim,), jnp.float32),
        "head": cls_head.init(hcfg, k5),
    }

    def forward(p, x, rng):
        tokens = image_tok.apply(p["tokenizer"], x, tcfg)
        b = tokens.shape[0]
        cls_tok = jnp.broadcast_to(p["cls_token"], (b, 1, ecfg.dim))
        seq = jnp.concatenate([cls_tok, tokens], axis=1) + p["pos_embed"]
        xenc, aux = moe_enc.encode(p["encoder"], seq, ecfg)
        xenc = enc.layer_norm(xenc, p["norm_scale"], p["norm_bias"], 1e-6)
        logits = cls_head.apply(p["head"], xenc[:, 0], hcfg)
        return logits, aux

    def loss_fn(out, label):
        logits, aux = out
        return step_lib.cross_entropy_loss(logits, label) + aux

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, img, img, 3)), jnp.float32
                ),
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    return Recipe(
        params, forward, synth,
        loss_fn=loss_fn, classification=False, best_mode="min",
    )


def build_multimodal(cfg, key, smoke=False):
    """Multimodal joint training: the README.md:113-150 demo trio
    (video + audio + time-series tokens concatenated into the shared
    encoder) as a trainable recipe — the reference repo's 'Multimodal
    Joint Training with Meta-Transformer' ToDo row, which it ships no
    trainer for."""
    from metatransformer_tpu.models import multimodal_classifier as mm
    from metatransformer_tpu.tokenizers import (
        audio as audio_tok,
        time_series as ts_tok,
        video as video_tok,
    )

    ecfg = _encoder_cfg(cfg, smoke)
    t = cfg.model.get("tokenizer", {})
    c_in = t.get("ts_channels", 7)
    if smoke:
        toks = (
            video_tok.VideoTokenizerConfig(num_frames=4, img_size=32, dim=ecfg.dim),
            audio_tok.AudioTokenizerConfig(
                num_mel_bins=64, num_frames=64, dim=ecfg.dim
            ),
            ts_tok.TimeSeriesConfig(c_in=c_in, dim=ecfg.dim),
        )
        shapes = {"video": (4, 32, 32, 3), "audio": (64, 64), "time-series": (24, c_in)}
    else:
        toks = (
            video_tok.VideoTokenizerConfig(
                num_frames=t.get("num_frames", 16),
                img_size=t.get("img_size", 224),
                dim=ecfg.dim,
            ),
            audio_tok.AudioTokenizerConfig(dim=ecfg.dim),
            ts_tok.TimeSeriesConfig(c_in=c_in, dim=ecfg.dim),
        )
        shapes = {
            "video": (t.get("num_frames", 16), t.get("img_size", 224),
                      t.get("img_size", 224), 3),
            "audio": (1024, 128),
            "time-series": (t.get("ts_len", 96), c_in),
        }
    mcfg = mm.MultimodalClassifierConfig(
        tokenizers=toks, encoder=ecfg, num_classes=cfg.model.num_classes
    )
    params = mm.init(mcfg, key)

    def forward(p, x, rng):
        return mm.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": {
                    m: jnp.asarray(
                        rng.standard_normal((batch_size,) + s, np.float32)
                    )
                    for m, s in shapes.items()
                },
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    return Recipe(params=params, forward=forward, synth=synth)


def build_video(cfg, key, smoke=False):
    """Kinetics-400 finetune assembly (Video/run_class_finetuning.py:406)."""
    from metatransformer_tpu.models import video_classifier
    from metatransformer_tpu.tokenizers import video as video_tok

    if cfg.model.get("pretrain", False):
        return _build_video_mae(cfg, key, smoke)
    ecfg = _encoder_cfg(cfg, smoke)
    t = cfg.model.tokenizer
    frames = 4 if smoke else t.num_frames
    img = 32 if smoke else t.img_size
    mcfg = video_classifier.VideoClassifierConfig(
        tokenizer=video_tok.VideoTokenizerConfig(
            num_frames=frames,
            img_size=img,
            patch_size=t.patch_size,
            tubelet_size=t.tubelet_size,
            dim=ecfg.dim,
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
    )
    params = video_classifier.init(mcfg, key)

    def forward(p, x, rng):
        return video_classifier.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, frames, img, img, 3)),
                    jnp.float32,
                ),
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    return Recipe(params, forward, synth)


def _build_video_mae(cfg, key, smoke=False):
    """VideoMAE tube-masked pretraining (Video/models/modeling_pretrain.py
    + dataset/masking_generator.py; run_mae_pretraining entry)."""
    from metatransformer_tpu.models import video_pretrain
    from metatransformer_tpu.tokenizers import video as video_tok

    ecfg = _encoder_cfg(cfg, smoke)
    t = cfg.model.tokenizer
    frames = 4 if smoke else t.num_frames
    img = 16 if smoke else t.img_size
    patch = 8 if smoke else t.patch_size
    d = cfg.model.get("decoder", {})
    mcfg = video_pretrain.VideoMAEConfig(
        tokenizer=video_tok.VideoTokenizerConfig(
            num_frames=frames, img_size=img, patch_size=patch,
            tubelet_size=t.tubelet_size, dim=ecfg.dim,
        ),
        encoder=ecfg,
        decoder=enc.EncoderConfig(
            dim=16 if smoke else d.get("dim", 384),
            depth=1 if smoke else d.get("depth", 4),
            num_heads=2 if smoke else d.get("num_heads", 6),
        ),
        mask_ratio=0.5 if smoke else cfg.model.get("mask_ratio", 0.9),
    )
    params = video_pretrain.init(mcfg, key)

    def forward(p, x, rng):
        loss, _ = video_pretrain.forward_loss(p, x, rng, mcfg)
        return loss

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, frames, img, img, 3)),
                    jnp.float32,
                ),
                "label": jnp.zeros((batch_size,), jnp.int32),  # unused
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def build_tabular(cfg, key, smoke=False):
    """Adult/Bank-Marketing TabTransformer assembly
    (Tabular/run_experiments/adult/adult_meta-transformer.py:103-161);
    synthetic schema mirrors Adult's 9 categorical + 6 continuous columns."""
    from metatransformer_tpu.models import tabular_classifier
    from metatransformer_tpu.tokenizers import tabular as tab_tok

    ecfg = _encoder_cfg(cfg, smoke)
    m = cfg.model
    if smoke:
        n_cat, vocab, n_cont = 3, 8, 2
    else:
        n_cat = m.get("n_categorical", 9)
        vocab = m.get("vocab_size", 42)
        n_cont = m.get("n_continuous", 6)
    mcfg = tabular_classifier.TabularClassifierConfig(
        tokenizer=tab_tok.TabularTokenizerConfig(
            vocab_sizes=(vocab,) * n_cat, n_continuous=n_cont, dim=ecfg.dim
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
    )
    params = tabular_classifier.init(mcfg, key)

    def forward(p, x, rng):
        return tabular_classifier.forward(
            p, x["categorical"], mcfg, continuous=x["continuous"],
            precision=enc.BF16,
        )

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": {
                    "categorical": jnp.asarray(
                        rng.integers(0, vocab, (batch_size, n_cat)), jnp.int32
                    ),
                    "continuous": jnp.asarray(
                        rng.standard_normal((batch_size, n_cont)), jnp.float32
                    ),
                },
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    loss_fn = None
    if cfg.train.get("loss") == "focal":
        # the Bank-Marketing focal option (bankm_meta-transformer.py)
        from metatransformer_tpu.train import losses as tr_losses

        def loss_fn(logits, labels):
            return tr_losses.focal(logits, labels)

    return Recipe(params, forward, synth, loss_fn=loss_fn)


def build_hyper(cfg, key, smoke=False):
    """Indian Pines band-patch classification
    (Hyper-spectrum/metatransformer.py:111-165 + train.py band patches).
    ``model.mode: caf`` selects the SpectralFormer CAF variant
    (train.py:22 ``--mode {ViT,CAF}``)."""
    from metatransformer_tpu.models import hyper_classifier
    from metatransformer_tpu.tokenizers import hyper as hyper_tok

    ecfg = _encoder_cfg(cfg, smoke)
    t = cfg.model.get("tokenizer", {})
    patch = 3 if smoke else t.get("patch", 7)
    near_band = t.get("near_band", 3)
    n_tokens = 8 if smoke else t.get("num_tokens", 200)
    mcfg = hyper_classifier.HyperClassifierConfig(
        tokenizer=hyper_tok.HyperTokenizerConfig(
            img_size=patch, near_band=near_band, num_tokens=n_tokens,
            dim=ecfg.dim,
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
        mode=cfg.model.get("mode", "vit").lower(),
    )
    params = hyper_classifier.init(mcfg, key)
    patch_dim = mcfg.tokenizer.patch_dim

    def forward(p, x, rng):
        return hyper_classifier.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, n_tokens, patch_dim)),
                    jnp.float32,
                ),
                "label": _labels(rng, batch_size, cfg.model.num_classes),
            }

    return Recipe(params, forward, synth)


# ---------------------------------------------------------------------------
# Regression-style modalities
# ---------------------------------------------------------------------------


def build_time_series(cfg, key, smoke=False):
    """Time-series task dispatch (Time-Series/run.py:109-118 +
    models/MetaTransformer.py): long/short-term forecasting (ETT / M4,
    MSE / sMAPE loss) and UEA-style sequence classification."""
    from metatransformer_tpu.models import time_series as ts_model

    ecfg = _encoder_cfg(cfg, smoke)
    m = cfg.model
    task = m.get("task", "long_term_forecast")
    seq_len = 8 if smoke else m.seq_len
    if task == "classification":
        return _build_ts_classification(cfg, key, ecfg, seq_len, smoke)
    if task in ("imputation", "anomaly_detection"):
        return _build_ts_reconstruction(cfg, key, ecfg, seq_len, task, smoke)
    pred_len = 4 if smoke else m.pred_len
    label_len = seq_len // 2
    mcfg = ts_model.TimeSeriesModelConfig(
        task=m.get("task", "long_term_forecast"),
        pred_len=pred_len,
        seq_len=seq_len,
        enc_in=m.enc_in,
        dec_in=m.dec_in,
        c_out=m.c_out,
        embed_type=m.get("embed", "fixed"),
        freq=m.get("freq", "h"),
        encoder=ecfg,
        decoder=ts_model.DecoderConfig(
            dim=ecfg.dim,
            d_ff=4 * ecfg.dim if smoke else 2048,
            num_heads=4 if smoke else 8,
            depth=m.get("d_layers", 1),
        ),
    )
    params = ts_model.init(mcfg, key)

    def forward(p, x, rng):
        pred = ts_model.forward(
            p, x["x_enc"], mcfg, x["x_mark_enc"], x["x_dec"], x["x_mark_dec"],
            precision=enc.BF16,
        )
        return pred

    if cfg.train.get("loss") == "smape":
        # the M4 metric-as-loss (Time-Series/utils/losses.py smape_loss)
        def loss(pred, label):
            return jnp.mean(
                200.0 * jnp.abs(pred - label)
                / (jnp.abs(pred) + jnp.abs(label) + 1e-8)
            )
    else:
        def loss(pred, label):
            return jnp.mean((pred - label) ** 2)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        c = m.enc_in
        for _ in range(n_batches):
            series = rng.standard_normal(
                (batch_size, seq_len + pred_len, c)
            ).astype(np.float32)
            x_enc = series[:, :seq_len]
            y = series[:, seq_len:]
            # decoder input: label_len of history + zeroed future (the
            # Time-Series-Library convention)
            x_dec = np.concatenate(
                [x_enc[:, -label_len:], np.zeros_like(y)], axis=1
            )
            marks = rng.integers(
                0, 4, (batch_size, seq_len + pred_len, 4)
            ).astype(np.int32)
            yield {
                "input": {
                    "x_enc": jnp.asarray(x_enc),
                    "x_mark_enc": jnp.asarray(marks[:, :seq_len]),
                    "x_dec": jnp.asarray(x_dec),
                    "x_mark_dec": jnp.asarray(
                        np.concatenate(
                            [marks[:, seq_len - label_len : seq_len], marks[:, seq_len:]],
                            axis=1,
                        )
                    ),
                },
                "label": jnp.asarray(y),
            }

    return Recipe(
        params, forward, synth, loss_fn=loss, classification=False,
        best_mode="min",
    )


def _build_ts_reconstruction(cfg, key, ecfg, seq_len, task, smoke):
    """Imputation / anomaly detection (Time-Series/exp/{exp_imputation,
    exp_anomaly_detection}.py): per-timestep projection of encoder
    features back to the input channels; imputation scores MSE on the
    *masked* positions only, anomaly detection on the full reconstruction."""
    from metatransformer_tpu.models import time_series as ts_model

    m = cfg.model
    mcfg = ts_model.TimeSeriesModelConfig(
        task=task,
        seq_len=seq_len,
        pred_len=0,
        enc_in=m.enc_in,
        dec_in=m.enc_in,
        c_out=m.enc_in,
        embed_type=m.get("embed", "fixed"),
        freq=m.get("freq", "h"),
        encoder=ecfg,
        decoder=ts_model.DecoderConfig(
            dim=ecfg.dim, d_ff=4 * ecfg.dim, num_heads=4, depth=1
        ),
    )
    params = ts_model.init(mcfg, key)
    mask_rate = m.get("mask_rate", 0.375)  # TSLib imputation default

    def forward(p, x, rng):
        return ts_model.forward(
            p, x["x_enc"], mcfg, x.get("x_mark_enc"), precision=enc.BF16
        )

    if task == "imputation":
        def loss(recon, label):
            miss = 1.0 - label["observed"]  # [B, T, C], 1 = to impute
            return jnp.sum((recon - label["y"]) ** 2 * miss) / jnp.maximum(
                jnp.sum(miss), 1.0
            )
    else:
        def loss(recon, label):
            return jnp.mean((recon - label["y"]) ** 2)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            y = rng.standard_normal(
                (batch_size, seq_len, m.enc_in)
            ).astype(np.float32)
            marks = rng.integers(0, 4, (batch_size, seq_len, 4)).astype(
                np.int32
            )
            if task == "imputation":
                observed = (
                    rng.uniform(size=(batch_size, seq_len, m.enc_in))
                    > mask_rate
                ).astype(np.float32)
                x_enc = y * observed
            else:
                observed = np.ones_like(y)
                x_enc = y
            yield {
                "input": {
                    "x_enc": jnp.asarray(x_enc),
                    "x_mark_enc": jnp.asarray(marks),
                },
                "label": {
                    "y": jnp.asarray(y),
                    "observed": jnp.asarray(observed),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=loss, classification=False,
        best_mode="min",
    )


def _build_ts_classification(cfg, key, ecfg, seq_len, smoke):
    """UEA sequence classification (Time-Series/exp/exp_classification.py:
    flattened encoder features + GELU -> linear over num_classes)."""
    from metatransformer_tpu.models import time_series as ts_model

    m = cfg.model
    mcfg = ts_model.TimeSeriesModelConfig(
        task="classification",
        seq_len=seq_len,
        pred_len=0,
        enc_in=m.enc_in,
        dec_in=m.enc_in,
        c_out=m.enc_in,
        num_classes=m.num_classes,
        embed_type=m.get("embed", "fixed"),
        freq=m.get("freq", "h"),
        encoder=ecfg,
        decoder=ts_model.DecoderConfig(
            dim=ecfg.dim, d_ff=4 * ecfg.dim, num_heads=4, depth=1
        ),
    )
    params = ts_model.init(mcfg, key)

    def forward(p, x, rng):
        return ts_model.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": jnp.asarray(
                    rng.standard_normal((batch_size, seq_len, m.enc_in)),
                    jnp.float32,
                ),
                "label": _labels(rng, batch_size, m.num_classes),
            }

    return Recipe(params, forward, synth)


def build_graph(cfg, key, smoke=False):
    """PCQM4Mv2 TokenGT regression (Graph/metatransformer/models/tokengt.py
    + scripts/pcqv2-metatransformer_fixed.sh recipe: heads=32, L1 loss)."""
    from metatransformer_tpu.data import graph_collate
    from metatransformer_tpu.models import graph_predictor
    from metatransformer_tpu.tokenizers import graph as graph_tok

    heads = cfg.model.get("encoder_heads", 32)
    ecfg = _encoder_cfg(cfg, smoke, num_heads=4 if smoke else heads)
    if cfg.model.get("performer", False):
        # the optional FAVOR+ path (tokengt_graph_encoder.py:223-245)
        ecfg = dataclasses.replace(ecfg, attn_impl="performer")
    t = cfg.model.tokenizer
    lap_k = 3 if smoke else t.get("lap_node_id_k", 16)
    mcfg = graph_predictor.GraphPredictorConfig(
        tokenizer=graph_tok.GraphTokenizerConfig(
            num_atoms=64 if smoke else 4608,
            num_edge_types=64 if smoke else 1536,
            dim=ecfg.dim,
            lap_node_id=t.get("lap_node_id", True),
            lap_node_id_k=lap_k,
            lap_node_id_sign_flip=t.get("lap_node_id_sign_flip", True),
            type_id=t.get("type_id", True),
        ),
        encoder=ecfg,
        num_targets=cfg.model.get("num_targets", 1),
    )
    params = graph_predictor.init(mcfg, key)
    max_nodes, max_edges = (4, 4) if smoke else (64, 128)

    def forward(p, x, rng):
        return graph_predictor.forward(
            p, x, mcfg, rng=rng, train=rng is not None, precision=enc.BF16
        )[:, 0]

    def l1(pred, label):
        return jnp.mean(jnp.abs(pred - label))

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            graphs = []
            for _b in range(batch_size):
                n = int(rng.integers(2, max_nodes + 1))
                e = int(rng.integers(1, max_edges + 1))
                graphs.append(
                    {
                        "node_data": rng.integers(1, 30, (n, 1)).astype(np.int32),
                        "edge_index": rng.integers(0, n, (e, 2)).astype(np.int32),
                        "edge_data": rng.integers(1, 30, (e, 1)).astype(np.int32),
                    }
                )
            batch = {
                k: jnp.asarray(v)
                for k, v in graph_collate.collate(
                    graphs, max_nodes, max_edges, lap_k=lap_k
                ).items()
            }
            yield {
                "input": batch,
                "label": jnp.asarray(
                    rng.standard_normal(batch_size).astype(np.float32)
                ),
            }

    return Recipe(
        params, forward, synth, loss_fn=l1, classification=False,
        best_mode="min",
    )


# ---------------------------------------------------------------------------
# Dense-prediction image tasks (loss computed inside forward)
# ---------------------------------------------------------------------------


def _adapter_cfg(cfg, smoke: bool):
    from metatransformer_tpu.models import vit_adapter

    b = cfg.model.backbone
    if smoke:
        return vit_adapter.ViTAdapterConfig(
            encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=4),
            img_size=64,
            patch_size=16,
            conv_inplane=8,
            deform_num_heads=4,
            interaction_indexes=((0, 0), (1, 1)),
        )
    return vit_adapter.ViTAdapterConfig(
        encoder=_encoder_cfg(cfg, False),
        img_size=b.img_size,
        patch_size=b.patch_size,
        deform_num_heads=b.deform_num_heads,
        interaction_indexes=tuple(tuple(p) for p in b.interaction_indexes),
    )


def build_segmentation(cfg, key, smoke=False):
    """ADE20K UperNet over ViT-Adapter
    (Image/segmentation/train.py:100-207 + the ade20k config)."""
    from metatransformer_tpu.models import segmentor

    bcfg = _adapter_cfg(cfg, smoke)
    mcfg = segmentor.SegmentorConfig(
        backbone=bcfg, num_classes=cfg.model.num_classes
    )
    params = segmentor.init(mcfg, key)
    img = bcfg.img_size

    def forward(p, x, rng):
        logits = segmentor.forward(p, x["image"], mcfg, precision=enc.BF16)
        return segmentor.seg_loss(logits, x["seg_label"])

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            labels = rng.integers(
                0, cfg.model.num_classes, (batch_size, img, img)
            )
            labels[:, :4] = 255  # ignore region
            yield {
                "input": {
                    "image": jnp.asarray(
                        rng.standard_normal((batch_size, img, img, 3)),
                        jnp.float32,
                    ),
                    "seg_label": jnp.asarray(labels),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def build_point_seg(cfg, key, smoke=False):
    """Point-cloud semantic / part segmentation (S3DIS 13-class rooms,
    ShapeNetPart 50 parts — ``PointCloud/examples/segmentation`` +
    ``openpoints/models/segmentation/base_seg.py:15``): shared-encoder
    seg path with 3-NN feature propagation back to every point."""
    from metatransformer_tpu.models import point_segmenter
    from metatransformer_tpu.tokenizers import point as point_tok

    m = cfg.model
    if m.get("NAME") == "PointTransformerSeg":
        return _build_point_transformer_seg(cfg, key, smoke)
    if m.get("NAME") in ("RandLANet", "BAAFNet", "StratifiedTransformer"):
        return _build_seg_baseline(cfg, key, smoke)
    ecfg = _encoder_cfg(cfg, smoke)
    t = m.get("tokenizer", {})
    in_channels = t.get("in_channels", 3)
    n_points = 64 if smoke else cfg.train.get("num_points", 2048)
    mcfg = point_segmenter.PointSegmenterConfig(
        tokenizer=point_tok.PointTokenizerConfig(
            sample_ratio=t.get("sample_ratio", 0.25),
            group_size=8 if smoke else t.get("group_size", 32),
            in_channels=in_channels,
            embed_dim=ecfg.dim,
            feature_type=t.get("feature_type", "dp_fj"),
        ),
        encoder=ecfg,
        num_classes=m.num_classes,
        head_hidden=32 if smoke else 256,
    )
    params = point_segmenter.init(mcfg, key)

    def forward(p, x, rng):
        return point_segmenter.forward(
            p, x["points"], mcfg,
            features=x.get("features"), precision=enc.BF16,
        )

    def seg_ce(logits, labels):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    shapenetpart = m.get("dataset") == "shapenetpart"

    def synth(batch_size, n_batches, seed):
        from metatransformer_tpu.utils import seg_eval

        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            pts = rng.standard_normal((batch_size, n_points, 3)).astype(
                np.float32
            )
            batch = {"points": jnp.asarray(pts)}
            if in_channels > 3:
                batch["features"] = jnp.asarray(
                    rng.standard_normal(
                        (batch_size, n_points, in_channels)
                    ).astype(np.float32)
                )
            out = {"input": batch}
            if shapenetpart:
                # labels drawn within each shape's category parts, so the
                # ins-mIoU protocol sees realistic label structure
                cls = rng.integers(0, 16, batch_size)
                labels = np.stack([
                    rng.choice(
                        seg_eval.SHAPENETPART_CLS2PARTS[c], n_points
                    )
                    for c in cls
                ])
                out["label"] = jnp.asarray(labels)
                out["cls"] = jnp.asarray(cls)
            else:
                out["label"] = jnp.asarray(
                    rng.integers(0, m.num_classes, (batch_size, n_points))
                )
            yield out

    eval_metric = None
    if shapenetpart:
        # ShapeNetPart --eval protocol: per-shape instance mIoU + per-
        # category mIoU (PointCloud/examples/shapenetpart/main.py:67-96).
        def eval_metric(params, fwd, batches):
            from metatransformer_tpu.utils import seg_eval

            ious, cats = [], []
            for batch in batches:
                logits = fwd(
                    params, batch["input"], jax.random.PRNGKey(0)
                )
                preds = np.asarray(jnp.argmax(logits, -1))
                cls = np.asarray(batch["cls"])
                ious.append(
                    seg_eval.instance_mious(
                        preds, np.asarray(batch["label"]), cls
                    )
                )
                cats.append(cls)
            agg = seg_eval.aggregate_part_mious(
                np.concatenate(ious), np.concatenate(cats)
            )
            return {
                "ins_miou": 100.0 * agg["ins_miou"],
                "cls_miou": 100.0 * agg["cls_miou"],
            }

    return Recipe(
        params, forward, synth, loss_fn=seg_ce, classification=False,
        best_mode="min", eval_metric=eval_metric,
    )


def _build_seg_baseline(cfg, key, smoke=False):
    """RandLA-Net / BAAF-Net segmentation baselines as recipes
    (openpoints ``randlenet.py`` / ``baafnet.py`` launcher surface)."""
    from metatransformer_tpu.models import (  # noqa: F401
        baafnet, randlanet, stratified_transformer,
    )
    from metatransformer_tpu.utils.registry import MODELS

    m = cfg.model
    name = m.NAME
    mod = MODELS.get(name)
    ncls = m.num_classes
    if smoke:
        if name == "RandLANet":
            mcfg = randlanet.RandLANetConfig(
                num_classes=ncls, d_in=3, num_neighbors=8,
                enc_dims=(8, 16), head_dims=(16,),
            )
        elif name == "StratifiedTransformer":
            mcfg = stratified_transformer.StratifiedConfig(
                num_classes=ncls, in_channels=3,
                channels=(8, 8, 16), depths=(1, 1, 2), num_heads=(1, 2, 2),
                k=8, n_kernel_pts=5,
            )
        else:
            mcfg = baafnet.BAAFNetConfig(
                num_classes=ncls, d_in=3, k=8, dims=(4, 8, 16)
            )
        n_points = 64
    elif name == "StratifiedTransformer":
        mcfg = mod.Config(num_classes=ncls, in_channels=m.get("d_in", 3))
        n_points = cfg.train.get("num_points", 4096)
    else:
        mcfg = mod.Config(num_classes=ncls, d_in=m.get("d_in", 3))
        n_points = cfg.train.get("num_points", 4096)

    params = mod.init(mcfg, key)

    def forward(p, x, rng):
        return mod.forward(p, x["points"], mcfg, features=x.get("features"))

    def seg_ce(logits, labels):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            yield {
                "input": {
                    "points": jnp.asarray(
                        rng.standard_normal(
                            (batch_size, n_points, 3)
                        ).astype(np.float32)
                    )
                },
                "label": jnp.asarray(
                    rng.integers(0, ncls, (batch_size, n_points))
                ),
            }

    return Recipe(
        params, forward, synth, loss_fn=seg_ce, classification=False,
        best_mode="min",
    )


def _build_point_transformer_seg(cfg, key, smoke=False):
    """PointTransformer vector-attention seg baseline as a recipe
    (openpoints pointtransformer.py PTSeg; S3DIS launcher surface)."""
    from metatransformer_tpu.models import point_transformer_seg as pts

    m = cfg.model
    if smoke:
        mcfg = pts.PointTransformerSegConfig(
            num_classes=m.num_classes, in_channels=3, width=8,
            blocks=(2, 2, 2), strides=(1, 4, 4), nsample=(8, 8, 8),
            share_planes=4,
        )
        n_points, in_channels = 64, 3
    else:
        in_channels = m.get("tokenizer", {}).get("in_channels", 3)
        mcfg = pts.PointTransformerSegConfig(
            num_classes=m.num_classes, in_channels=in_channels,
            width=m.get("width", 32),
        )
        n_points = cfg.train.get("num_points", 2048)
    params = pts.init(mcfg, key)

    def forward(p, x, rng):
        return pts.forward(p, x["points"], mcfg, features=x.get("features"))

    def seg_ce(logits, labels):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            batch = {
                "points": jnp.asarray(
                    rng.standard_normal((batch_size, n_points, 3)).astype(
                        np.float32
                    )
                )
            }
            if in_channels > 3:
                batch["features"] = jnp.asarray(
                    rng.standard_normal(
                        (batch_size, n_points, in_channels)
                    ).astype(np.float32)
                )
            yield {
                "input": batch,
                "label": jnp.asarray(
                    rng.integers(0, m.num_classes, (batch_size, n_points))
                ),
            }

    return Recipe(
        params, forward, synth, loss_fn=seg_ce, classification=False,
        best_mode="min",
    )


def build_mask2former(cfg, key, smoke=False):
    """ADE20K Mask2Former (mask2former_head.py + msdeformattn pixel
    decoder); per-layer Hungarian matching runs on host, so the train
    step is unjitted (the loss itself is differentiable)."""
    from metatransformer_tpu.heads import mask2former as m2f
    from metatransformer_tpu.models import segmentor, vit_adapter

    bcfg = _adapter_cfg(cfg, smoke)
    if smoke:
        mcfg = segmentor.Mask2FormerSegmentorConfig(
            backbone=bcfg, num_classes=cfg.model.num_classes,
            head_channels=32, num_queries=8, num_decoder_layers=1,
            num_encoder_layers=1, num_heads=4,
        )
        num_points = 64
    else:
        mcfg = segmentor.Mask2FormerSegmentorConfig(
            backbone=bcfg,
            num_classes=cfg.model.num_classes,
            head_channels=cfg.model.head_channels,
            num_queries=cfg.model.num_queries,
            num_decoder_layers=cfg.model.num_decoder_layers,
            num_encoder_layers=cfg.model.num_encoder_layers,
            num_heads=cfg.model.num_heads,
        )
        num_points = cfg.train.get("num_points", 12544)
    params = segmentor.init_mask2former(mcfg, key)
    img = bcfg.img_size
    hcfg = mcfg.head

    def forward(p, x, rng):
        feats = vit_adapter.apply(p["backbone"], x["image"], bcfg, enc.BF16)
        all_cls, all_masks = m2f.apply(p["head"], feats, hcfg, enc.BF16.mm)
        loss, _logs = m2f.loss(
            all_cls, all_masks, x["gt_labels"], x["gt_masks"], x["gt_valid"],
            hcfg, rng if rng is not None else jax.random.PRNGKey(0),
            num_points=num_points,
        )
        return loss

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        g, mh, mw = 3, img // 4, img // 4
        for _ in range(n_batches):
            masks = np.zeros((batch_size, g, mh, mw), np.float32)
            for b in range(batch_size):
                for gi in range(g):
                    y0, x0 = rng.integers(0, mh // 2, 2)
                    masks[b, gi, y0 : y0 + mh // 2, x0 : x0 + mw // 2] = 1.0
            yield {
                "input": {
                    "image": jnp.asarray(
                        rng.standard_normal((batch_size, img, img, 3)),
                        jnp.float32,
                    ),
                    "gt_labels": rng.integers(
                        0, cfg.model.num_classes, (batch_size, g)
                    ).astype(np.int32),
                    "gt_masks": masks,
                    "gt_valid": np.ones((batch_size, g), bool),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def build_htc(cfg, key, smoke=False):
    """COCO HTC++ (interleaved cascade + mask info flow + semantic
    branch — Image/detection/configs/htc++/)."""
    from metatransformer_tpu.heads import detection2d as d2
    from metatransformer_tpu.models import htc

    r = cfg.model.rcnn
    if smoke:
        bcfg = _adapter_cfg(cfg, True)
        mcfg = htc.HTCConfig(
            backbone=bcfg,
            fpn=d2.FPNConfig(in_channels=(32,) * 4, out_channels=32),
            rpn=d2.RPNConfig(channels=32, nms_pre=64, max_proposals=8),
            rcnn=d2.RCNNConfig(
                num_classes=5, channels=32, fc_dim=64, num_stages=3,
                with_mask=True, mask_size=7,
            ),
            img_size=bcfg.img_size,
            semantic_classes=12,
            semantic_convs=2,
        )
    else:
        bcfg = _adapter_cfg(cfg, False)
        d = bcfg.encoder.dim
        mcfg = htc.HTCConfig(
            backbone=bcfg,
            fpn=d2.FPNConfig(in_channels=(d,) * 4),
            rcnn=d2.RCNNConfig(
                num_classes=r.get("num_classes", 80), num_stages=3,
                with_mask=True,
            ),
            img_size=bcfg.img_size,
            semantic_classes=cfg.model.get("semantic_classes", 183),
        )
    params = htc.init(mcfg, key)
    img = mcfg.img_size
    nc = mcfg.rcnn.num_classes
    sc = mcfg.semantic_classes

    def forward(p, x, rng):
        return htc.forward_train(
            p, x["image"], x["gt_boxes"], x["gt_labels"], x["gt_valid"],
            mcfg, gt_masks=x["gt_masks"],
            semantic_labels=x["semantic_labels"], precision=enc.BF16,
        )[0]

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        g = 2
        for _ in range(n_batches):
            x0y0 = rng.uniform(0, img // 2, (batch_size, g, 2))
            wh = rng.uniform(img // 8, img // 2, (batch_size, g, 2))
            boxes = np.concatenate(
                [x0y0, np.minimum(x0y0 + wh, img - 1)], axis=-1
            ).astype(np.float32)
            masks = np.zeros((batch_size, g, img, img), np.float32)
            sem = np.full((batch_size, img, img), 255, np.int64)
            for b in range(batch_size):
                for gi in range(g):
                    x0, y0, x1, y1 = boxes[b, gi].astype(int)
                    masks[b, gi, y0:y1, x0:x1] = 1.0
                    sem[b, y0:y1, x0:x1] = (gi + 1) % sc
            yield {
                "input": {
                    "image": jnp.asarray(
                        rng.standard_normal((batch_size, img, img, 3)),
                        jnp.float32,
                    ),
                    "gt_boxes": jnp.asarray(boxes),
                    "gt_labels": jnp.asarray(
                        rng.integers(0, nc, (batch_size, g)), jnp.int32
                    ),
                    "gt_valid": jnp.ones((batch_size, g), bool),
                    "gt_masks": jnp.asarray(masks),
                    "semantic_labels": jnp.asarray(sem),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def build_detection2d(cfg, key, smoke=False):
    """COCO Mask/Cascade R-CNN over ViT-Adapter FPN
    (Image/detection/configs/{mask_rcnn,cascade_rcnn}/)."""
    from metatransformer_tpu.heads import detection2d as d2
    from metatransformer_tpu.models import mask_rcnn

    r = cfg.model.rcnn
    stages = r.get("num_stages", 1)
    stage_ious = tuple(r.get("stage_ious", (0.5, 0.6, 0.7)))
    if smoke:
        bcfg = _adapter_cfg(cfg, True)
        mcfg = mask_rcnn.MaskRCNNConfig(
            backbone=bcfg,
            fpn=d2.FPNConfig(in_channels=(32,) * 4, out_channels=32),
            rpn=d2.RPNConfig(channels=32, nms_pre=64, max_proposals=16),
            rcnn=d2.RCNNConfig(
                num_classes=5, channels=32, fc_dim=64, num_stages=stages,
                stage_ious=stage_ious, with_mask=r.get("with_mask", True),
                mask_size=7, bbox_head=r.get("bbox_head", "2fc"),
            ),
            img_size=bcfg.img_size,
        )
    else:
        bcfg = _adapter_cfg(cfg, False)
        d = bcfg.encoder.dim
        mcfg = mask_rcnn.MaskRCNNConfig(
            backbone=bcfg,
            fpn=d2.FPNConfig(in_channels=(d,) * 4),
            rpn=d2.RPNConfig(),
            rcnn=d2.RCNNConfig(
                num_classes=r.get("num_classes", 80), num_stages=stages,
                stage_ious=stage_ious, with_mask=r.get("with_mask", True),
                bbox_head=r.get("bbox_head", "2fc"),
            ),
            img_size=bcfg.img_size,
        )
    params = mask_rcnn.init(mcfg, key)
    img = mcfg.img_size
    nc = mcfg.rcnn.num_classes

    use_lsj = cfg.train.get("lsj", False)

    def forward(p, x, rng):
        image, gt_boxes = x["image"], x["gt_boxes"]
        if use_lsj:
            from metatransformer_tpu.train import augment as _aug

            image, gt_boxes, _ = _aug.large_scale_jitter(rng, image, gt_boxes)
        loss, _logs = mask_rcnn.forward_train(
            p, image, gt_boxes, x["gt_labels"], x["gt_valid"],
            mcfg, gt_masks=x["gt_masks"] if mcfg.rcnn.with_mask else None,
            precision=enc.BF16,
        )
        return loss

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        g = 2
        for _ in range(n_batches):
            x0y0 = rng.uniform(0, img // 2, (batch_size, g, 2))
            wh = rng.uniform(img // 8, img // 2, (batch_size, g, 2))
            boxes = np.concatenate(
                [x0y0, np.minimum(x0y0 + wh, img - 1)], axis=-1
            ).astype(np.float32)
            masks = np.zeros((batch_size, g, img, img), np.float32)
            for b in range(batch_size):
                for gi in range(g):
                    x0, y0, x1, y1 = boxes[b, gi].astype(int)
                    masks[b, gi, y0:y1, x0:x1] = 1.0
            yield {
                "input": {
                    "image": jnp.asarray(
                        rng.standard_normal((batch_size, img, img, 3)),
                        jnp.float32,
                    ),
                    "gt_boxes": jnp.asarray(boxes),
                    "gt_labels": jnp.asarray(
                        rng.integers(0, nc, (batch_size, g)), jnp.int32
                    ),
                    "gt_valid": jnp.ones((batch_size, g), bool),
                    "gt_masks": jnp.asarray(masks),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


# ---------------------------------------------------------------------------
# 3D detection (KITTI detector zoo — AutonomousDriving/pcdet)
# ---------------------------------------------------------------------------

# Tiny-but-complete KITTI-like geometry shared by all smoke detectors
# (matches the proven test geometries in tests/test_voxel_rcnn.py etc.).
_SMOKE_RANGE = (0.0, -3.2, -3.0, 6.4, 3.2, 2.0)


def _smoke_second_cfg(num_classes=1):
    from metatransformer_tpu.models import second

    return second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=_SMOKE_RANGE,
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
        num_classes=num_classes,
    )


def _full_second_cfg(m, num_classes=None):
    from metatransformer_tpu.models import second

    return second.SECONDConfig(
        voxel_size=tuple(m.get("voxel_size", (0.05, 0.05, 0.1))),
        pc_range=tuple(m.get("pc_range", (0.0, -40.0, -3.0, 70.4, 40.0, 1.0))),
        spatial_shape=tuple(m.get("spatial_shape", (41, 1600, 1408))),
        max_voxels=m.get("max_voxels", 16000),
        num_classes=num_classes or m.get("num_classes", 1),
    )


def _det3d_synth(pc_range, num_classes, n_points):
    """Points uniform in range + two car-ish gt boxes near the middle."""

    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    span = hi - lo

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            pts = (
                lo + rng.uniform(0, 1, (batch_size, n_points, 3)) * span
            ).astype(np.float32)
            inten = rng.uniform(0, 1, (batch_size, n_points, 1)).astype(np.float32)
            ctr = (lo + span * rng.uniform(0.3, 0.7, (batch_size, 2, 3))).astype(
                np.float32
            )
            size = np.broadcast_to(
                np.asarray([min(3.2, span[0] / 2), 1.6, 1.5], np.float32),
                ctr.shape,
            )
            yaw = rng.uniform(-0.4, 0.4, (batch_size, 2, 1)).astype(np.float32)
            gt = np.concatenate([ctr, size, yaw], axis=-1)
            yield {
                "input": {
                    "points": jnp.asarray(np.concatenate([pts, inten], -1)),
                    "gt_boxes": jnp.asarray(gt),
                    "gt_labels": jnp.asarray(
                        rng.integers(1, max(num_classes, 1) + 1, (batch_size, 2)),
                        jnp.int32,
                    ),
                    "gt_valid": jnp.asarray(
                        np.stack(
                            [np.ones(batch_size, bool), np.zeros(batch_size, bool)],
                            axis=1,
                        )
                    ),
                },
            }

    return synth


def _det3d_recipe(params, forward, pc_range, num_classes, smoke):
    return Recipe(
        params, forward, _det3d_synth(pc_range, num_classes, 128 if smoke else 1024),
        loss_fn=_identity_loss, classification=False, best_mode="min",
    )


def build_pointpillars(cfg, key, smoke=False):
    """KITTI PointPillars (pcdet pointpillar.yaml; dense BEV path)."""
    from metatransformer_tpu.models import detector3d
    from metatransformer_tpu.ops import voxelize

    m = cfg.model
    a = m.anchors
    acfg = detector3d.AnchorConfig(
        sizes=tuple(tuple(s) for s in a.sizes),
        rotations=tuple(a.rotations),
        z_centers=tuple(a.z_centers),
        matched_thrs=tuple(a.matched_thrs),
        unmatched_thrs=tuple(a.unmatched_thrs),
    )
    if smoke:
        vcfg = voxelize.VoxelConfig(
            pc_range=_SMOKE_RANGE, voxel_size=(0.4, 0.4, 5.0)
        )
        mcfg = detector3d.Detector3DConfig(
            vfe=voxelize.PillarVFEConfig(voxel=vcfg, channels=8),
            bev_channels=(8, 16),
            bev_strides=(2, 2),
            up_channels=8,
            anchors=acfg,
            num_classes=m.num_classes,
        )
    else:
        vcfg = voxelize.VoxelConfig(
            pc_range=tuple(m.voxel.pc_range), voxel_size=tuple(m.voxel.voxel_size)
        )
        mcfg = detector3d.Detector3DConfig(
            vfe=voxelize.PillarVFEConfig(voxel=vcfg, channels=m.vfe_channels),
            bev_channels=tuple(m.bev_channels),
            anchors=acfg,
            num_classes=m.num_classes,
        )
    params = detector3d.init(mcfg, key)
    anchors = jnp.asarray(detector3d.generate_anchors(mcfg))

    def forward(p, x, rng):
        preds = detector3d.forward(p, x["points"], mcfg)
        return detector3d.detection_loss(
            preds, anchors, x["gt_boxes"], x["gt_valid"], mcfg,
            gt_labels=x["gt_labels"],
        )[0]

    return _det3d_recipe(params, forward, mcfg.vfe.voxel.pc_range, m.num_classes, smoke)


def build_second(cfg, key, smoke=False):
    """KITTI SECOND (sparse voxel backbone + anchor head)."""
    from metatransformer_tpu.models import second

    m = cfg.model
    scfg = (
        _smoke_second_cfg(m.get("num_classes", 1))
        if smoke
        else _full_second_cfg(m)
    )
    params = second.init(scfg, key)
    anchors = jnp.asarray(second.generate_anchors(scfg))

    def forward(p, x, rng):
        preds = second.forward(p, x["points"], scfg)
        return second.detection_loss(
            preds, anchors, x["gt_boxes"], x["gt_valid"], scfg
        )[0]

    return _det3d_recipe(params, forward, scfg.pc_range, scfg.num_classes, smoke)


def build_centerpoint(cfg, key, smoke=False):
    """KITTI CenterPoint (residual sparse backbone + center head)."""
    from metatransformer_tpu.models import centerpoint as cp

    m = cfg.model
    if smoke:
        mcfg = dataclasses.replace(
            cp.CenterPointConfig(),
            spatial_shape=(25, 64, 64),
            pc_range=_SMOKE_RANGE,
            voxel_size=(0.1, 0.1, 0.2),
            max_voxels=256,
            widths=(4, 4, 8, 8, 8, 8),
            bev_channels=(8, 16),
            up_channels=8,
            bev_layer_num=2,
            shared_ch=8,
            post_center_range=(-10, -10, -10, 10, 10, 10),
            num_classes=m.get("num_classes", 3),
        )
    else:
        mcfg = dataclasses.replace(
            cp.CenterPointConfig(),
            voxel_size=tuple(m.voxel_size),
            pc_range=tuple(m.pc_range),
            spatial_shape=tuple(m.spatial_shape),
            max_voxels=m.max_voxels,
            point_features=m.get("point_features", 4),
            num_classes=m.num_classes,
            feature_map_stride=m.get("feature_map_stride", 8),
            max_objs=m.get("max_objs", 500),
            gaussian_overlap=m.get("gaussian_overlap", 0.1),
            min_radius=m.get("min_radius", 2),
        )
    params = cp.init(mcfg, key)

    def forward(p, x, rng):
        pts = x["points"]
        if pts.shape[-1] < mcfg.point_features:  # synth data is (xyz, i)
            pts = jnp.concatenate(
                [pts, jnp.zeros(
                    pts.shape[:-1] + (mcfg.point_features - pts.shape[-1],),
                    pts.dtype)], -1)
        preds = cp.forward(p, pts, mcfg)
        return cp.detection_loss(
            preds, x["gt_boxes"], x["gt_labels"], x["gt_valid"], mcfg
        )[0]

    return _det3d_recipe(params, forward, mcfg.pc_range, mcfg.num_classes, smoke)


def build_centerpoint_nusc(cfg, key, smoke=False):
    """nuScenes CenterPoint: CLASS_NAMES_EACH_HEAD multihead groups +
    velocity branch (cbgs_voxel01_res3d_centerpoint.yaml)."""
    from metatransformer_tpu.models import centerpoint as cp

    m = cfg.model
    groups = tuple(tuple(g) for g in m.class_groups)
    if smoke:
        mcfg = dataclasses.replace(
            cp.CenterPointConfig(),
            spatial_shape=(25, 64, 64),
            pc_range=_SMOKE_RANGE,
            voxel_size=(0.1, 0.1, 0.2),
            max_voxels=256,
            widths=(4, 4, 8, 8, 8, 8),
            bev_channels=(8, 16),
            up_channels=8,
            bev_layer_num=2,
            shared_ch=8,
            post_center_range=(-10, -10, -10, 10, 10, 10),
            num_classes=m.num_classes,
            class_groups=groups,
            velocity=True,
            code_weights=tuple(m.code_weights),
            loc_weight=m.get("loc_weight", 0.25),
        )
    else:
        mcfg = dataclasses.replace(
            cp.CenterPointConfig(),
            voxel_size=tuple(m.voxel_size),
            pc_range=tuple(m.pc_range),
            spatial_shape=tuple(m.spatial_shape),
            max_voxels=m.max_voxels,
            point_features=m.get("point_features", 4),
            num_classes=m.num_classes,
            class_groups=groups,
            velocity=bool(m.get("velocity", True)),
            code_weights=tuple(m.code_weights),
            loc_weight=m.get("loc_weight", 0.25),
            score_thresh=m.get("score_thresh", 0.1),
            nms_thresh=m.get("nms_thresh", 0.2),
            post_center_range=tuple(m.post_center_range),
            feature_map_stride=m.get("feature_map_stride", 8),
            max_objs=m.get("max_objs", 500),
            gaussian_overlap=m.get("gaussian_overlap", 0.1),
            min_radius=m.get("min_radius", 2),
        )
    params = cp.init(mcfg, key)

    def forward(p, x, rng):
        pts = x["points"]
        if pts.shape[-1] < mcfg.point_features:  # synth data lacks dt
            pad = jnp.zeros(
                pts.shape[:-1] + (mcfg.point_features - pts.shape[-1],),
                pts.dtype,
            )
            pts = jnp.concatenate([pts, pad], -1)
        gt = x["gt_boxes"]
        if mcfg.velocity and gt.shape[-1] == 7:
            gt = jnp.concatenate(
                [gt, jnp.zeros(gt.shape[:-1] + (2,), gt.dtype)], -1
            )
        labels = jnp.clip(x["gt_labels"] - 1, 0, mcfg.num_classes - 1)
        preds = cp.forward(p, pts, mcfg)
        return cp.detection_loss(preds, gt, labels, x["gt_valid"], mcfg)[0]

    return _det3d_recipe(params, forward, mcfg.pc_range, mcfg.num_classes, smoke)


def _two_stage_builder(model_name: str):
    """voxel_rcnn / pv_rcnn / pv_rcnn_pp / part_a2 / second_iou share the
    (points, gt, anchors) training interface over a SECOND stage-1."""

    def build(cfg, key, smoke=False):
        import importlib

        from metatransformer_tpu.models import second

        mod = importlib.import_module(f"metatransformer_tpu.models.{model_name}")
        m = cfg.model
        stage1 = _smoke_second_cfg() if smoke else _full_second_cfg(m.get("stage1", {}))
        kwargs: Dict[str, Any] = {"stage1": stage1}
        if smoke:
            small = {
                "voxel_rcnn": dict(
                    num_rois=16, fg_per=8, grid_size=3,
                    shared_fc=(16,), cls_fc=(16,), reg_fc=(16,),
                    proposal_pre=64,
                ),
                "pv_rcnn": dict(
                    num_keypoints=32, out_features=16,
                    point_cls_fc=(16,), num_rois=8, fg_per=4, grid_size=3,
                    roi_radii=(0.8,), roi_nsamples=(8,), roi_mlp=8,
                    shared_fc=(16,), cls_fc=(16,), reg_fc=(16,),
                    proposal_pre=64,
                ),
                "pv_rcnn_pp": dict(
                    num_keypoints=24, num_sectors=4, out_features=16,
                    point_cls_fc=(16,), num_rois=8, fg_per=4, grid_size=3,
                    shared_fc=(16,), cls_fc=(16,), reg_fc=(16,),
                    proposal_pre=64,
                ),
                "part_a2": dict(
                    num_rois=8, fg_per=4, grid_size=3, pool_mlp=8,
                    shared_fc=(16,), cls_fc=(16,), reg_fc=(16,),
                    proposal_pre=64,
                ),
                "second_iou": dict(
                    num_rois=8, fg_per=4, grid_size=3,
                    shared_fc=(16,), iou_fc=(16,), proposal_pre=64,
                ),
            }[model_name]
            kwargs.update(small)
            if model_name == "voxel_rcnn":
                kwargs["pool_layers"] = (
                    ("x_conv2", mod.PoolLayerConfig(2, 0.4, nsample=8, mlp=8)),
                    ("x_conv3", mod.PoolLayerConfig(4, 0.8, nsample=8, mlp=8)),
                )
            elif model_name == "pv_rcnn":
                kwargs["sa_layers"] = (
                    ("raw_points", mod.SALayerConfig((0.4,), (8,), 8)),
                    ("x_conv2", mod.SALayerConfig((0.8,), (8,), 8, stride=2)),
                    ("x_conv4", mod.SALayerConfig((2.4,), (8,), 8, stride=8)),
                )
            elif model_name == "pv_rcnn_pp":
                kwargs["vp_layers"] = (
                    ("raw_points", mod.VectorPoolConfig(2, 0.4, 8, 8, 8)),
                    ("x_conv4", mod.VectorPoolConfig(2, 2.4, 8, 8, 8, stride=8)),
                )
                kwargs["roi_vp"] = mod.VectorPoolConfig(2, 0.8, 8, 8, 8)
        else:
            for k in ("num_rois", "fg_per", "grid_size"):
                if m.get(k) is not None:
                    kwargs[k] = m[k]
        cfg_cls = {
            "voxel_rcnn": "VoxelRCNNConfig",
            "pv_rcnn": "PVRCNNConfig",
            "pv_rcnn_pp": "PVRCNNPPConfig",
            "part_a2": "PartA2Config",
            "second_iou": "SECONDIoUConfig",
        }[model_name]
        mcfg = getattr(mod, cfg_cls)(**kwargs)
        params = mod.init(mcfg, key)
        anchors = jnp.asarray(second.generate_anchors(stage1))

        def forward(p, x, rng):
            return mod.training_loss(
                p, x["points"], x["gt_boxes"], x["gt_valid"], anchors, mcfg
            )[0]

        return _det3d_recipe(
            params, forward, stage1.pc_range, stage1.num_classes, smoke
        )

    return build


def build_point_rcnn(cfg, key, smoke=False):
    """KITTI PointRCNN (point-based two-stage)."""
    from metatransformer_tpu.models import point_rcnn as pr

    m = cfg.model
    if smoke:
        mcfg = pr.PointRCNNConfig(
            num_classes=3,
            sa_stages=(
                pr.SAStage(32, (0.5, 1.0), (8, 8), ((8, 8), (8, 8))),
                pr.SAStage(8, (1.0, 2.0), (8, 8), ((8, 16), (8, 16))),
            ),
            fp_mlps=((16, 16), (32, 32)),
            head_cls_fc=(16,),
            head_reg_fc=(16,),
            num_rois=8,
            fg_per=4,
            num_sampled_points=16,
            xyz_up=(8, 8),
            roi_sa_stages=(
                pr.SAStage(8, (0.5,), (8,), ((16, 16),)),
                pr.SAStage(-1, (100.0,), (8,), ((16, 32),)),
            ),
            cls_fc=(16,),
            reg_fc=(16,),
            proposal_pre=64,
        )
    else:
        mcfg = pr.PointRCNNConfig(
            num_classes=m.get("num_classes", 3),
            num_rois=m.get("num_rois", 128),
            fg_per=m.get("fg_per", 64),
            num_sampled_points=m.get("num_sampled_points", 512),
        )
    params = pr.init(mcfg, key)

    def forward(p, x, rng):
        return pr.training_loss(
            p, x["points"], x["gt_boxes"], x["gt_labels"], x["gt_valid"], mcfg
        )[0]

    pc_range = _SMOKE_RANGE if smoke else (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    return _det3d_recipe(params, forward, pc_range, mcfg.num_classes, smoke)


def build_iassd(cfg, key, smoke=False):
    """KITTI IA-SSD (instance-aware single-stage point-based)."""
    from metatransformer_tpu.models import iassd

    m = cfg.model
    if smoke:
        mcfg = iassd.IASSDConfig(
            stages=(
                iassd.IASSDStage("sa", 32, "d-fps", (0.5, 1.0), (8, 8),
                                 ((8, 8), (8, 8)), agg=8, conf=8, layer_input=0),
                iassd.IASSDStage("sa", 16, "ctr-aware", (1.0, 2.0), (8, 8),
                                 ((8, 16), (8, 16)), agg=16, conf=16,
                                 layer_input=1),
                iassd.IASSDStage("sa", 8, "ctr-aware", layer_input=2, agg=16),
                iassd.IASSDStage("vote", layer_input=3, vote_mlp=(8,)),
                iassd.IASSDStage("sa", -1, "d-fps", (2.0, 4.0), (8, 8),
                                 ((16, 16), (16, 32)), agg=32,
                                 layer_input=2, ctr_input=4),
            ),
            cls_fc=(16,),
            reg_fc=(16,),
        )
    else:
        mcfg = iassd.IASSDConfig(
            num_classes=m.get("num_classes", 3),
            angle_bins=m.get("angle_bins", 12),
        )
    params = iassd.init(mcfg, key)

    def forward(p, x, rng):
        return iassd.training_loss(
            p, x["points"], x["gt_boxes"], x["gt_labels"], x["gt_valid"], mcfg
        )[0]

    pc_range = _SMOKE_RANGE if smoke else (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    return _det3d_recipe(params, forward, pc_range, mcfg.num_classes, smoke)


def build_mdf_second(cfg, key, smoke=False):
    """MDF SECOND: two synthetic 'datasets' with different point/intensity
    statistics, merged-loss joint training
    (tools/train_multi_db_merge_loss.py over the UniNorm backbones)."""
    from metatransformer_tpu.models import mdf_detectors as md
    from metatransformer_tpu.models import second

    m = cfg.model
    base = _smoke_second_cfg(1) if smoke else _full_second_cfg(m, num_classes=1)
    mcfg = md.MDFSECONDConfig(
        base=base,
        num_datasets=m.get("num_datasets", 2),
        domain_attention=m.get("domain_attention", True),
        reduction=4 if smoke else 8,
    )
    params = md.init(mcfg, key)
    anchors = jnp.asarray(second.generate_anchors(base))
    wa = cfg.train.get("weight_a", 1.0)
    wb = cfg.train.get("weight_b", 1.0)

    def forward(p, x, rng):
        la = md.training_loss(
            p, x["a"]["points"], x["a"]["gt_boxes"], x["a"]["gt_valid"],
            anchors, mcfg, jnp.int32(0),
        )[0]
        lb = md.training_loss(
            p, x["b"]["points"], x["b"]["gt_boxes"], x["b"]["gt_valid"],
            anchors, mcfg, jnp.int32(1),
        )[0]
        return wa * la + wb * lb

    n_points = 128 if smoke else 1024
    synth_a = _det3d_synth(base.pc_range, 1, n_points)
    synth_b = _det3d_synth(base.pc_range, 1, n_points)

    def synth(batch_size, n_batches, seed):
        for a, b in zip(
            synth_a(batch_size, n_batches, seed),
            synth_b(batch_size, n_batches, seed + 1000),
        ):
            yield {"input": {"a": a["input"], "b": b["input"]}}

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def build_caddn(cfg, key, smoke=False):
    """KITTI CaDDN (monocular camera detector; LID depth bins + frustum)."""
    from metatransformer_tpu.models import caddn

    m = cfg.model
    if smoke:
        mcfg = caddn.CaDDNConfig(
            image_hw=(32, 64),
            depth_min=2.0,
            depth_max=10.0,
            num_bins=16,
            stem=(8, 16),
            frustum_ch=8,
            pc_range=(2.0, -4.0, -2.0, 10.0, 4.0, 1.0),
            grid_size=(16, 16, 6),
            bev_channels=(8, 16),
            up_channels=8,
            bev_layer_num=1,
        )
    else:
        mcfg = caddn.CaDDNConfig(
            depth_min=m.get("depth_min", 2.0),
            depth_max=m.get("depth_max", 46.8),
            num_bins=m.get("num_bins", 80),
        )
    params = caddn.init(mcfg, key)
    anchors = jnp.asarray(caddn.generate_anchors(mcfg))
    h, w = mcfg.image_hw
    hf, wf = mcfg.feat_hw

    def forward(p, x, rng):
        return caddn.training_loss(
            p, x["image"], x["lidar_to_cam"], x["cam_to_img"],
            x["depth_maps"], x["fg_mask"], x["gt_boxes"], x["gt_valid"],
            anchors, mcfg,
        )[0]

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        # lidar (x fwd, y left, z up) -> cam (z fwd, x right, y down)
        l2c = np.zeros((4, 4), np.float32)
        l2c[0, 1] = -1.0
        l2c[1, 2] = -1.0
        l2c[2, 0] = 1.0
        l2c[3, 3] = 1.0
        f = w  # crude focal
        c2i = np.asarray(
            [[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0]], np.float32
        )
        lo = np.asarray(mcfg.pc_range[:3])
        span = np.asarray(mcfg.pc_range[3:]) - lo
        for _ in range(n_batches):
            ctr = (lo + span * rng.uniform(0.3, 0.7, (batch_size, 2, 3))).astype(
                np.float32
            )
            size = np.broadcast_to(
                np.asarray([3.2, 1.6, 1.5], np.float32), ctr.shape
            )
            yaw = rng.uniform(-0.3, 0.3, (batch_size, 2, 1)).astype(np.float32)
            gt = np.concatenate([ctr, size, yaw], axis=-1)
            depth = rng.uniform(
                mcfg.depth_min, mcfg.depth_max, (batch_size, hf, wf)
            ).astype(np.float32)
            fg = np.zeros((batch_size, hf, wf), bool)
            fg[:, hf // 4 : 3 * hf // 4, wf // 4 : 3 * wf // 4] = True
            yield {
                "input": {
                    "image": jnp.asarray(
                        rng.uniform(0, 1, (batch_size, h, w, 3)), jnp.float32
                    ),
                    "lidar_to_cam": jnp.asarray(
                        np.broadcast_to(l2c, (batch_size, 4, 4))
                    ),
                    "cam_to_img": jnp.asarray(
                        np.broadcast_to(c2i, (batch_size, 3, 4))
                    ),
                    "depth_maps": jnp.asarray(depth),
                    "fg_mask": jnp.asarray(fg),
                    "gt_boxes": jnp.asarray(gt),
                    "gt_valid": jnp.asarray(
                        np.stack(
                            [np.ones(batch_size, bool), np.zeros(batch_size, bool)],
                            axis=1,
                        )
                    ),
                },
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


# ---------------------------------------------------------------------------
# Registry + dispatch
# ---------------------------------------------------------------------------


def _point_builder(cfg, key, smoke=False):
    # re-exported from train_cli to avoid a circular import at module load
    from metatransformer_tpu import train_cli

    if smoke:
        cfg = _smoked(cfg)
    params, forward, synth = train_cli.build_point(cfg, key)
    return Recipe(params, forward, synth)


def _point_dispatch(cfg, key, smoke=False):
    """MetaTransformer (default) vs baseline-zoo NAME dispatch."""
    if cfg.model.get("NAME") == "MaskedPointViT":
        return _build_point_mae(cfg, key, smoke)
    if cfg.model.get("NAME") not in (None, "MetaTransformer", "BaseCls"):
        return build_point_baseline(cfg, key, smoke)
    return _point_builder(cfg, key, smoke)


def _build_point_mae(cfg, key, smoke=False):
    """MAE-style point pretraining (openpoints/models/reconstruction/
    maskedpointvit.py; examples/reconstruction launcher surface)."""
    from metatransformer_tpu.models import point_mae

    m = cfg.model
    if smoke:
        mcfg = point_mae.MaskedPointViTConfig(
            dim=16, depth=1, num_heads=2, decoder_dim=8, decoder_depth=1,
            decoder_heads=2, mask_ratio=0.5, sample_ratio=0.125,
            group_size=8,
        )
        n_pts = 64
    else:
        mcfg = point_mae.MaskedPointViTConfig(
            dim=m.get("dim", 384), depth=m.get("depth", 12),
            num_heads=m.get("num_heads", 6),
            decoder_dim=m.get("decoder_dim", 192),
            decoder_depth=m.get("decoder_depth", 4),
            decoder_heads=m.get("decoder_heads", 16),
            mask_ratio=m.get("mask_ratio", 0.75),
            sample_ratio=m.get("sample_ratio", 0.0625),
            group_size=m.get("group_size", 32),
        )
        n_pts = cfg.train.get("num_points", 1024)
    params = point_mae.init(mcfg, key)

    def forward(p, x, rng):
        loss, _ = point_mae.forward(p, x, rng, mcfg)
        return loss

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            pts = rng.standard_normal((batch_size, n_pts, 3))
            yield {
                "input": jnp.asarray(pts * 0.5, jnp.float32),
                "label": jnp.zeros((batch_size,), jnp.int32),  # unused
            }

    return Recipe(
        params, forward, synth, loss_fn=_identity_loss,
        classification=False, best_mode="min",
    )


def _point_zoo_smoke_cfg(name, num_classes):
    """Tiny structurally-identical geometry per zoo entry (mirrors the
    small configs the unit tests train with)."""
    from metatransformer_tpu.models import (
        curvenet as cn, point_baselines as pb, point_baselines2 as pb2,
        point_baselines3 as pb3,
    )

    table = {
        "BallDGCNN": lambda: pb3.BallDGCNNConfig(
            num_classes=num_classes, channels=8, embed_dim=32, n_blocks=4,
            k=8, radius=0.4, head_fcs=(16,),
        ),
        "GroupPointNet": lambda: pb3.GroupPointNetConfig(
            num_classes=num_classes, channels=8, n_blocks=4, k=8,
            head_fcs=(16,),
        ),
        "ViTGraph": lambda: pb3.ViTGraphConfig(
            num_classes=num_classes, encoder_dim=32, embed_dim=16, depth=2,
            num_heads=4, num_groups=128, group_size=8, head_fcs=(16,),
        ),
        "PointNet2Encoder": lambda: pb.PointNet2Config(
            num_classes=num_classes,
            stages=(
                pb.SAMSGStage(32, (0.2, 0.4), (8, 16), ((8, 16), (8, 16))),
                pb.SAMSGStage(8, (0.4, 0.8), (8, 16), ((16, 32), (16, 32))),
            ),
            global_mlp=(32, 64), head_fcs=(32,),
        ),
        "DGCNN": lambda: pb.DGCNNConfig(
            num_classes=num_classes, k=8, edge_channels=(8, 8, 16),
            emb_dim=32, head_fcs=(16,),
        ),
        "PointMLP": lambda: pb.PointMLPConfig(
            num_classes=num_classes, embed_dim=8, k=8,
            stage_channels=(8, 16), head_fcs=(16,),
        ),
        "PointNeXt": lambda: pb.PointNeXtConfig(
            num_classes=num_classes, stem_dim=8, stage_channels=(8, 16),
            base_radius=0.3, k=8, head_fcs=(16,),
        ),
        "PointNetEncoder": lambda: pb2.PointNetConfig(
            num_classes=num_classes, head_fcs=(32,)
        ),
        "PCT": lambda: pb2.PCTConfig(
            num_classes=num_classes, stem=(8, 8), stage_points=(16, 8),
            stage_channels=(16, 32), k=8, num_sa=2, fuse_dim=32,
            head_fcs=(16,),
        ),
        "PointViT": lambda: pb2.PointViTConfig(
            num_classes=num_classes, dim=32, depth=2, num_heads=4,
            num_groups=128, group_size=8, head_fcs=(16,),
        ),
        "DeepGCN": lambda: pb2.DeepGCNConfig(
            num_classes=num_classes, channels=8, emb_dim=32, n_blocks=3,
            k=4, head_fcs=(16,),
        ),
        "CurveNet": lambda: cn.CurveNetConfig(
            num_classes=num_classes, embed_dim=8, k=8,
            stages=(
                cn.CICStage(64, 0.4, 8, 16, (8, 3)),
                cn.CICStage(16, 0.8, 8, 32, None),
            ),
            head_fcs=(16,),
        ),
        "SimpleView": lambda: _simpleview_smoke(num_classes),
    }
    return table[name]()


def _simpleview_smoke(num_classes):
    from metatransformer_tpu.models import simpleview as sv

    return sv.SimpleViewConfig(
        num_classes=num_classes, channels=4, resolution=32,
        blocks_per_stage=1,
    )


def build_point_baseline(cfg, key, smoke=False):
    """Baseline-zoo classification recipes: cfg.model.NAME selects a
    registry backbone (the openpoints ``cfgs/modelnet40ply2048/*.yaml``
    launcher surface: one YAML per vendored baseline)."""
    # imports for registry side-effects
    from metatransformer_tpu.models import (  # noqa: F401
        curvenet, point_baselines, point_baselines2, point_baselines3,
        simpleview,
    )
    from metatransformer_tpu.utils.registry import MODELS

    name = cfg.model.NAME
    mod = MODELS.get(name)
    ncls = cfg.model.num_classes
    mcfg = _point_zoo_smoke_cfg(name, ncls) if smoke else mod.Config(
        num_classes=ncls
    )
    params = mod.init(mcfg, key)

    def forward(p, x, rng):
        return mod.forward(p, x, mcfg)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        n = 64 if smoke else cfg.train.get("num_points", 1024)
        for _ in range(n_batches):
            pts = rng.standard_normal((batch_size, n, 3)).astype(np.float32)
            yield {
                "input": jnp.asarray(pts * 0.5),
                "label": _labels(rng, batch_size, ncls),
            }

    return Recipe(params, forward, synth)


def _audio_builder(cfg, key, smoke=False):
    from metatransformer_tpu import train_cli

    if smoke:
        cfg = _smoked(cfg)
    params, forward, synth = train_cli.build_audio(cfg, key)
    return Recipe(params, forward, synth)


def _smoked(cfg):
    from metatransformer_tpu.configs.config import Config

    cfg = Config.wrap(cfg.to_dict())
    cfg.encoder.scale = "tiny"
    return cfg


DET3D_BUILDERS = {
    "SECONDNet": build_second,
    "CenterPoint": build_centerpoint,
    "CenterPointNusc": build_centerpoint_nusc,
    "VoxelRCNN": _two_stage_builder("voxel_rcnn"),
    "PVRCNN": _two_stage_builder("pv_rcnn"),
    "PVRCNNPP": _two_stage_builder("pv_rcnn_pp"),
    "PartA2": _two_stage_builder("part_a2"),
    "SECONDIoU": _two_stage_builder("second_iou"),
    "PointRCNN": build_point_rcnn,
    "IASSD": build_iassd,
    "CaDDN": build_caddn,
    "MDFSECONDNet": build_mdf_second,
}


def build(cfg, key, smoke: bool = False) -> Recipe:
    """Dispatch on (task, modality, model NAME) — the one entry replacing
    the reference's launcher zoo (SURVEY.md §5.6)."""
    task = cfg.get("task")
    if task == "detection3d":
        name = cfg.model.get("NAME")
        if name is None:
            return build_pointpillars(cfg, key, smoke)
        if name not in DET3D_BUILDERS:
            raise SystemExit(f"unknown 3D detector NAME {name!r}")
        return DET3D_BUILDERS[name](cfg, key, smoke)
    if task == "segmentation":
        if cfg.get("modality") in ("point", "pointcloud"):
            return build_point_seg(cfg, key, smoke)
        if cfg.model.get("NAME") == "Mask2FormerSegmentor":
            return build_mask2former(cfg, key, smoke)
        return build_segmentation(cfg, key, smoke)
    if task == "detection2d":
        if cfg.model.get("NAME") == "HTC":
            return build_htc(cfg, key, smoke)
        return build_detection2d(cfg, key, smoke)
    modality = cfg.modality
    builders = {
        "image": build_image,
        "xray": build_image,
        "infrared": build_image,
        "video": build_video,
        "time-series": build_time_series,
        "graph": build_graph,
        "tabular": build_tabular,
        "hyper": build_hyper,
        "point": _point_dispatch,
        "pointcloud": _point_dispatch,
        "audio": _audio_builder,
        "multimodal": build_multimodal,
    }
    if modality not in builders:
        raise SystemExit(f"no recipe builder for modality {modality!r}")
    return builders[modality](cfg, key, smoke)
