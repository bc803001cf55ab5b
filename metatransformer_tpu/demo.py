"""Demo / parity harness: raw input -> logits per modality, one command.

The v1 gate from SURVEY.md §7.4:

  python -m metatransformer_tpu.demo --modality image [--ckpt enc.npz]

loads the (converted) encoder checkpoint, jits tokenize+encode+head as a
single program, optionally cross-checks logits against the PyTorch twin
(when torch is importable and the modality has an oracle), and reports
seq/sec/chip. Iterates over modalities as tokenizers land.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import convert, encoder as enc


def _throughput(run, batch, iters=10):
    """On-device fori-loop chained timing (see bench.py for why)."""

    def chained(*args):
        def body(_, c):
            return jnp.mean(run(*args, c))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    fn = jax.jit(chained)
    float(fn(*batch))  # compile + execute (float() forces full sync)
    t0 = time.perf_counter()
    float(fn(*batch))
    return iters / (time.perf_counter() - t0)


def demo_image(encoder_params, ecfg, batch_size, precision):
    from metatransformer_tpu.models import image_classifier

    cfg = image_classifier.ImageClassifierConfig(encoder=ecfg)
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    if encoder_params is not None:
        params["encoder"] = encoder_params
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, 224, 224, 3), np.float32
        )
    )
    logits = image_classifier.forward(params, x, cfg, precision=precision)

    def run(params, x, c):
        return image_classifier.forward(params, x * (1 + 1e-9 * c), cfg,
                                        precision=precision)

    ips = _throughput(run, (params, x)) * batch_size
    return logits, ips


def demo_audio(encoder_params, ecfg, batch_size, precision):
    from metatransformer_tpu.models import audio_classifier
    from metatransformer_tpu.tokenizers import audio as audio_tok

    cfg = audio_classifier.AudioClassifierConfig(
        tokenizer=audio_tok.AudioTokenizerConfig(num_mel_bins=128, num_frames=98),
        encoder=ecfg,
        num_classes=35,
    )
    params = audio_classifier.init(cfg, jax.random.PRNGKey(0))
    if encoder_params is not None:
        params["encoder"] = encoder_params
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch_size, 16000), np.float32) * 0.1
    )
    logits = audio_classifier.forward_waveform(params, wav, cfg, precision=precision)

    def run(params, wav, c):
        return audio_classifier.forward_waveform(params, wav * (1 + 1e-9 * c), cfg,
                                                 precision=precision)

    ips = _throughput(run, (params, wav)) * batch_size
    return logits, ips


def demo_point(encoder_params, ecfg, batch_size, precision):
    from metatransformer_tpu.models import point_classifier

    cfg = point_classifier.PointClassifierConfig(encoder=ecfg)
    params = point_classifier.init(cfg, jax.random.PRNGKey(0))
    if encoder_params is not None:
        params["encoder"] = encoder_params
    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch_size, 1024, 3), np.float32)
    )
    logits = point_classifier.forward(params, pts, cfg, precision=precision)

    def run(params, pts, c):
        return point_classifier.forward(params, pts * (1 + 1e-9 * c), cfg,
                                        precision=precision)

    ips = _throughput(run, (params, pts)) * batch_size
    return logits, ips


def demo_video(encoder_params, ecfg, batch_size, precision):
    from metatransformer_tpu.models import video_classifier

    cfg = video_classifier.VideoClassifierConfig(encoder=ecfg)
    params = video_classifier.init(cfg, jax.random.PRNGKey(0))
    if encoder_params is not None:
        params["encoder"] = encoder_params
    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, 16, 224, 224, 3), np.float32
        )
    )
    logits = video_classifier.forward(params, clips, cfg, precision=precision)

    def run(params, clips, c):
        return video_classifier.forward(params, clips * (1 + 1e-9 * c), cfg,
                                        precision=precision)

    ips = _throughput(run, (params, clips)) * batch_size
    return logits, ips


DEMOS = {
    "image": demo_image,
    "audio": demo_audio,
    "point": demo_point,
    "video": demo_video,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--modality", default="image", choices=sorted(DEMOS))
    p.add_argument("--ckpt", default=None, help=".npz (converted) or .pth encoder")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--fp32", action="store_true", help="fp32 instead of bf16")
    args = p.parse_args(argv)

    ecfg = enc.BASE
    encoder_params = None
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            encoder_params, ecfg = convert.convert_pth(args.ckpt)
        else:
            encoder_params, ecfg = convert.load_npz(args.ckpt)
        print(f"loaded encoder: {ecfg}")

    precision = enc.FP32 if args.fp32 else enc.BF16
    logits, ips = DEMOS[args.modality](encoder_params, ecfg, args.batch_size, precision)
    ok = bool(np.isfinite(np.asarray(logits)).all())
    print(
        f"{args.modality}: logits {tuple(logits.shape)} finite={ok} "
        f"throughput={ips:.1f} seq/s/chip ({jax.devices()[0].platform})"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
