"""Multi-modality serving: the published Meta-Transformer usage pattern.

Reference (``README.md:113-150``): build per-modality ``Data2Seq``
tokenizers, ``torch.concat`` their token sequences along the sequence
axis, and run the shared frozen encoder over the fused sequence. This
module is the TPU-native equivalent: a unified tokenizer dispatcher with
the same modality vocabulary as ``Data2Seq/Data2Seq.py:25-36`` plus the
subproject-only modalities (point, tabular), a fuse-then-encode step that
is ONE jitted XLA program, and ragged handling via keep-masks.

All 12 modalities of the reference: text, image, point cloud, audio,
video, infrared, hyper-spectral, x-ray, tabular, graph, time-series, IMU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import (
    audio as audio_tok,
    graph as graph_tok,
    hyper as hyper_tok,
    image as image_tok,
    point as point_tok,
    tabular as tab_tok,
    text as text_tok,
    time_series as ts_tok,
    video as video_tok,
)

# modality name -> (tokenizer module, config class); mirrors the
# Data2Seq dispatcher map. image-like modalities share the image tokenizer.
MODALITIES: Dict[str, Tuple[Any, Any]] = {
    "image": (image_tok, image_tok.ImageTokenizerConfig),
    "infrared": (image_tok, image_tok.ImageTokenizerConfig),
    "x-ray": (image_tok, image_tok.ImageTokenizerConfig),
    "video": (video_tok, video_tok.VideoTokenizerConfig),
    "audio": (audio_tok, audio_tok.AudioTokenizerConfig),
    "time-series": (ts_tok, ts_tok.TimeSeriesConfig),
    "imu": (ts_tok, ts_tok.TimeSeriesConfig),
    "tabular": (tab_tok, tab_tok.TabularTokenizerConfig),
    "hyper": (hyper_tok, hyper_tok.HyperTokenizerConfig),
    "graph": (graph_tok, graph_tok.GraphTokenizerConfig),
    "text": (text_tok, text_tok.TextTokenizerConfig),
    "point": (point_tok, point_tok.PointTokenizerConfig),
}


@dataclasses.dataclass
class Data2Seq:
    """Drop-in analogue of the reference ``Data2Seq(modality, dim)``.

    ``init(key)`` creates params; calling the instance tokenizes raw input
    to [B, T, dim]. Modalities whose tokenizers need extra inputs (graph
    batch dicts, hyper cls token) accept them as kwargs.
    """

    modality: str
    dim: int = 768
    config: Optional[Any] = None

    def __post_init__(self):
        if self.modality not in MODALITIES:
            raise ValueError(
                f"unknown modality {self.modality!r}; known: {sorted(MODALITIES)}"
            )
        mod, cfg_cls = MODALITIES[self.modality]
        self._mod = mod
        if self.config is None:
            if self.modality == "text":
                self.config = cfg_cls(target_dim=self.dim)
            elif self.modality == "point":
                self.config = cfg_cls(embed_dim=self.dim)
            else:
                self.config = cfg_cls(dim=self.dim)

    def init(self, key: jax.Array) -> Dict[str, jax.Array]:
        return self._mod.init(self.config, key)

    def _apply(self, params, raw, **kw) -> jax.Array:
        mod = self.modality
        if mod == "point":
            _, tokens = self._mod.apply(params, raw, self.config, **kw)
            return tokens
        if mod == "graph":
            tokens, keep = self._mod.apply(params, raw, self.config, **kw)
            return tokens
        if mod == "hyper":
            cls = kw.pop("cls_token", jnp.zeros((1, 1, self.dim)))
            return self._mod.apply(params, raw, self.config, cls, **kw)
        return self._mod.apply(params, raw, self.config, **kw)

    def __call__(self, params, raw, **kw) -> jax.Array:
        # No-kwarg calls (the serving/bench path) run as ONE jitted XLA
        # program per raw shape — BASELINE.md's "one XLA program per
        # modality". Eager per-op dispatch is pathological through an
        # RPC device transport (each op a roundtrip: the CLIP text tower
        # alone is hundreds). kwarg calls (hyper cls_token, masks) fall
        # back to eager; wrap in your own jit there.
        if not kw:
            if getattr(self, "_jit_apply", None) is None:
                self._jit_apply = jax.jit(self._apply)
            return self._jit_apply(params, raw)
        return self._apply(params, raw, **kw)


def fuse_and_encode(
    encoder_params: Dict[str, jax.Array],
    token_groups: Sequence[jax.Array],
    cfg: enc.EncoderConfig,
    masks: Optional[Sequence[Optional[jax.Array]]] = None,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """concat token sequences along axis 1 and run the shared encoder.

    The multimodal fusion point of the reference (``README.md:122``):
    ``torch.concat([video_tokens, audio_tokens, ts_tokens], dim=1)``.
    """
    tokens = jnp.concatenate(list(token_groups), axis=1)
    mask = None
    if masks is not None and any(m is not None for m in masks):
        parts = []
        for toks, m in zip(token_groups, masks):
            if m is None:
                m = jnp.ones(toks.shape[:2], bool)
            parts.append(m)
        mask = jnp.concatenate(parts, axis=1)
    return enc.encode(encoder_params, tokens, cfg, mask=mask, precision=precision)


def bucket_length(t: int, buckets: Sequence[int] = (64, 128, 256, 512, 1024, 1600, 2048, 3072)) -> int:
    """Pick the bucket (static shape) for a ragged sequence length.

    Bounded compile cache: at most len(buckets) encoder programs serve
    every modality mix (SURVEY.md §5.7 bucketed-padding plan).
    """
    for b in buckets:
        if t <= b:
            return b
    raise ValueError(f"sequence length {t} exceeds largest bucket {buckets[-1]}")


def pad_to_bucket(
    tokens: jax.Array, mask: Optional[jax.Array] = None,
    buckets: Sequence[int] = (64, 128, 256, 512, 1024, 1600, 2048, 3072),
):
    """Pad [B, T, D] tokens (+mask) to the bucket length; returns (tokens,
    keep_mask)."""
    b, t, d = tokens.shape
    tb = bucket_length(t, buckets)
    if mask is None:
        mask = jnp.ones((b, t), bool)
    if tb > t:
        tokens = jnp.pad(tokens, ((0, 0), (0, tb - t), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, tb - t)))
    return tokens, mask


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def encode_bucketed(
    encoder_params: Dict[str, jax.Array],
    tokens: jax.Array,
    mask: jax.Array,
    cfg: enc.EncoderConfig,
    precision: enc.Precision = enc.BF16,
) -> jax.Array:
    """The single serving program per bucket: masked shared encoding."""
    return enc.encode(encoder_params, tokens, cfg, mask=mask, precision=precision)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def encode_bucketed_pooled(
    encoder_params: Dict[str, jax.Array],
    tokens: jax.Array,
    mask: jax.Array,
    cfg: enc.EncoderConfig,
    precision: enc.Precision = enc.BF16,
) -> jax.Array:
    """``encode_bucketed`` with the valid-token mean fused into the same
    program: [B, T, D] -> [B, D]. The pooled-serving readback is B*D
    floats instead of B*T*D — through any RPC device transport the full
    feature readback dominates serve latency, so pooling must not leave
    the device."""
    feats = enc.encode(
        encoder_params, tokens, cfg, mask=mask, precision=precision
    ).astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    return (feats * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
