"""Host input-pipeline feed-rate bench: raw bytes -> uint8 batches.

Measures what this host can FEED, against what the chip can EAT
(~4,015 seq/s B16 forward, BENCH_r04/05). The reference's answer to the
same problem is worker processes (torchvision/pcdet `num_workers`, AST
`Audio/src/dataloader.py`); ours is `ImageFolderLoader`'s thread pool —
the C decode layer (OpenCV/libjpeg-turbo when importable, PIL otherwise)
releases the GIL, so threads scale with cores without pickling batches
across processes.

Writes BENCH_INPUT.md and prints one JSON line per measurement.
Usage: python scripts/bench_input.py [--images N] [--device]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metatransformer_tpu.data import image_folder, video_decode  # noqa: E402


def make_jpeg_tree(root: str, n: int, size=(500, 375), quality=87) -> float:
    """ImageNet-ish JPEG tree (2 classes). Returns mean bytes/file."""
    from PIL import Image

    rng = np.random.default_rng(0)
    total = 0
    for i in range(n):
        cls = os.path.join(root, f"class{i % 2}")
        os.makedirs(cls, exist_ok=True)
        # low-frequency + noise: realistic JPEG entropy, not white noise
        yy, xx = np.mgrid[0 : size[1], 0 : size[0]].astype(np.float32)
        base = 127 + 80 * np.sin(yy / (20 + i % 7)) * np.cos(xx / (25 + i % 5))
        img = np.clip(
            base[..., None] + rng.normal(0, 18, (size[1], size[0], 3)), 0, 255
        ).astype(np.uint8)
        path = os.path.join(cls, f"{i:05d}.jpg")
        Image.fromarray(img).save(path, quality=quality)
        total += os.path.getsize(path)
    return total / n


def bench_decode_only(samples, n: int, img_size: int) -> float:
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(n):
        image_folder.decode_image(
            samples[i % len(samples)][0], img_size, train=True, rng=rng
        )
    return n / (time.perf_counter() - t0)


def bench_loader(root: str, batch: int, img_size: int, workers: int) -> float:
    loader = image_folder.ImageFolderLoader(
        root, batch, img_size=img_size, train=True, workers=workers
    )
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += b["input"].shape[0]
    return n / (time.perf_counter() - t0)


def bench_video(tmp: str, clips: int = 16) -> float:
    """MJPEG-AVI sampled decode (16 of 64 frames per clip) -> clips/s."""
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
    frames = np.clip(
        127
        + 80 * np.sin(yy[None] / 18 + np.arange(64)[:, None, None] * 0.2)
        + 20 * np.cos(xx[None] / 22),
        0,
        255,
    ).astype(np.uint8)
    frames = np.repeat(frames[..., None], 3, -1)
    path = os.path.join(tmp, "clip.avi")
    video_decode.write_mjpeg_avi(frames, path, quality=87)
    idx = np.linspace(0, 63, 16).astype(np.int64)
    video_decode.read_avi(path, idx)  # warm file cache
    t0 = time.perf_counter()
    for _ in range(clips):
        video_decode.read_avi(path, idx)
    return clips / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=192)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--device", action="store_true",
                    help="also measure host->device ingress-inclusive rate")
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        bytes_per = make_jpeg_tree(tmp, args.images)
        samples, _ = image_folder.scan_image_folder(tmp)

        r = bench_decode_only(samples, min(128, args.images), args.img_size)
        rows.append({"metric": "jpeg_decode_aug", "value": round(r, 1),
                     "unit": "img/s", "workers": 1})
        for w in (1, 2, 4):
            r = bench_loader(tmp, args.batch, args.img_size, w)
            rows.append({"metric": "imagefolder_feed", "value": round(r, 1),
                         "unit": "img/s", "workers": w})

        r = bench_video(tmp)
        rows.append({"metric": "mjpeg_avi_clip_decode", "value": round(r, 2),
                     "unit": "clips/s", "workers": 1,
                     "note": "16-of-64-frame sampled decode, 320x240"})

        if args.device:
            import jax
            import jax.numpy as jnp

            loader = image_folder.ImageFolderLoader(
                tmp, args.batch, img_size=args.img_size, train=True, workers=2
            )
            n = 0
            t0 = time.perf_counter()
            for b in loader:
                jnp.asarray(b["input"]).block_until_ready()
                n += b["input"].shape[0]
            rows.append({
                "metric": "feed_plus_ingress", "value": round(n / (time.perf_counter() - t0), 1),
                "unit": "img/s", "workers": 2,
                "device": str(jax.devices()[0]),
            })

    for row in rows:
        row["host_cores"] = ncpu
        print(json.dumps(row))

    feed1 = next(r for r in rows if r["metric"] == "imagefolder_feed"
                 and r["workers"] == 1)["value"]
    chip = 4015.0
    md = f"""# BENCH_INPUT — host input-pipeline feed rate

Host: {ncpu} core(s). Synthetic ImageNet-like JPEG tree
({args.images} files, ~{bytes_per/1024:.0f} KiB each, 500x375 q87),
decoded+augmented to {args.img_size}x{args.img_size} uint8 (RandomResizedCrop+flip,
the timm train transform), batch {args.batch}.

| metric | workers | rate |
|---|---|---|
"""
    for r in rows:
        md += f"| {r['metric']} | {r.get('workers','-')} | {r['value']} {r['unit']} |\n"
    md += f"""
## The honest gap

The chip consumes ~**4,015 seq/s** (B16 forward, BENCH_r04) and
~**1,224 seq/s** training (BENCH_TRAIN). This **{ncpu}-core host feeds
~{feed1:.0f} img/s** — a {chip/max(feed1,1e-9):.0f}x shortfall for forward,
{1224/max(feed1,1e-9):.0f}x for training, if decode ran on one core.

That is the same arithmetic every production TPU pipeline faces; the
design answer here (matching the reference's worker-pool answer) is:

1. **Decode threads scale with cores** — the decode backend (OpenCV/
   libjpeg-turbo preferred, PIL fallback) releases the GIL in C, so
   `ImageFolderLoader(workers=N)` scales near-linearly on a
   real host. Feeding 1,224 img/s needs ~{1224/max(feed1,1e-9):.0f} cores of this
   speed — a normal TPU-VM host (96–224 cores) covers it several times
   over, with the standard alternative (tf.data service / grain remote
   workers) beyond that.
2. **uint8 wire format** — all float work (scale, normalize, mixup) runs
   on-device, so host bytes/img = {args.img_size}x{args.img_size}x3 = 147 KiB, 4x
   less than float32; ingress at the measured ~140 MB/s tunnel rate is
   not the binding constraint on real PCIe/ICI hosts.
3. **Prefetch overlap** — the loader keeps `prefetch_batches` batches in
   flight and `loaders.prefetch_to_device` overlaps H2D with compute, so
   feed and step costs add as max(), not sum.

Video: sampled MJPEG-AVI decode (16 of 64 frames) runs at the rate above;
the container walk is free — cost is PIL JPEG decode per sampled frame
(decord's answer is the same, with ffmpeg threads).

Regenerate: `python scripts/bench_input.py [--device]`.
"""
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH_INPUT.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
