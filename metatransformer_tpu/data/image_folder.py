"""Raw-bytes image ingestion: JPEG/PNG files -> uint8 [B, S, S, 3] batches.

The reference trains from files on disk via framework loaders — mmseg
``LoadImageFromFile`` pipelines (``Image/segmentation/configs/_base_/
datasets/ade20k.py``), torchvision ImageFolder-style trees, pcdet/AST
worker pools. This is the TPU-native split of that work:

* HOST (this module): decode + geometric augmentation (RandomResizedCrop
  / resize+center-crop, horizontal flip) straight to **uint8 HWC** — the
  integer-only part done in C (OpenCV/libjpeg-turbo when importable,
  measured 1.8-2.4x PIL on this host; PIL otherwise).
* DEVICE (the jitted program): every float op — /255 scaling, normalize,
  mixup — runs on-chip (``tokenizers/image.py:70-76`` accepts uint8).
  uint8 wire format is 4x fewer ingress bytes than float32, which is the
  dominant cost on an RPC-attached device.

Feeding model: decode workers are a thread pool (both cv2 and PIL
release the GIL in their C decode layers); `workers=N` on a multi-core host
scales near-linearly the way the reference's `num_workers` processes do.
``scripts/bench_input.py`` measures the host feed rate and documents the
gap vs the chip's consumption rate (BENCH_INPUT.md).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def scan_image_folder(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    """torchvision-ImageFolder layout: root/<class_name>/<image files>.

    Returns (samples, class_names); class index = sorted class-dir order.
    """
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {root}")
    samples: List[Tuple[str, int]] = []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for dirpath, _, files in os.walk(cdir):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTENSIONS):
                    samples.append((os.path.join(dirpath, f), idx))
    if not samples:
        raise FileNotFoundError(f"no image files under {root}")
    return samples, classes


def read_manifest(path: str) -> List[Tuple[str, int]]:
    """``<path>\\t<int label>`` per line (AST-manifest-style alternative
    to the class-dir tree; relative paths resolve against the manifest's
    directory)."""
    base = os.path.dirname(os.path.abspath(path))
    samples = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p, label = line.rsplit("\t", 1)
            if not os.path.isabs(p):
                p = os.path.join(base, p)
            samples.append((p, int(label)))
    if not samples:
        raise ValueError(f"empty manifest {path}")
    return samples


def _random_resized_crop_box(
    w: int, h: int, rng: np.random.Generator,
    scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling (10 tries, center
    fallback) — the ImageNet train-time geometry every reference image
    recipe inherits from timm."""
    area = w * h
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            return x0, y0, cw, ch
    # fallback: largest center crop within ratio bounds
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


_CV2 = None
_CV2_TRIED = False


def _cv2():
    """Lazy OpenCV import. ``setNumThreads(0)`` on first use: the loader's
    thread pool is the parallelism layer, and OpenCV's internal pool
    nesting inside it oversubscribes cores (same rule torchvision/mmcv
    apply in their workers)."""
    global _CV2, _CV2_TRIED
    if not _CV2_TRIED:
        _CV2_TRIED = True
        try:
            import cv2

            cv2.setNumThreads(0)
            _CV2 = cv2
        except ImportError:
            _CV2 = None
    return _CV2


def decode_image(
    path: str,
    size: int = 224,
    train: bool = False,
    rng: Optional[np.random.Generator] = None,
    backend: str = "auto",
) -> np.ndarray:
    """One file -> uint8 [size, size, 3].

    train=True: RandomResizedCrop(size) + horizontal flip (p=0.5).
    train=False: resize short side to size*256/224, center crop (the
    standard ImageNet eval protocol).

    backend: 'auto' decodes with OpenCV when importable (measured 1.8x
    train / 2.4x eval over PIL on this host — libjpeg-turbo + SIMD
    resize) and falls back to PIL; 'cv2' / 'pil' force one. Both produce
    the same geometry from the same rng; pixel values differ at
    resample-kernel level only (both bilinear).
    """
    cv2 = _cv2() if backend in ("auto", "cv2") else None
    if backend == "cv2" and cv2 is None:
        raise RuntimeError("backend='cv2' requested but cv2 is not importable")
    if cv2 is not None:
        im = cv2.imread(path, cv2.IMREAD_COLOR)  # always 3-channel BGR
        if im is None and backend == "cv2":
            raise ValueError(f"{path}: cv2.imread could not decode")
        if im is not None:
            h, w = im.shape[:2]
            if train:
                rng = rng if rng is not None else np.random.default_rng()
                x0, y0, cw, ch = _random_resized_crop_box(w, h, rng)
                out = cv2.resize(
                    im[y0 : y0 + ch, x0 : x0 + cw],
                    (size, size),
                    interpolation=cv2.INTER_LINEAR,
                )
                if rng.random() < 0.5:
                    out = out[:, ::-1]
            else:
                short = int(round(size * 256 / 224))
                if w <= h:
                    nw, nh = short, max(int(round(h * short / w)), short)
                else:
                    nh, nw = short, max(int(round(w * short / h)), short)
                im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
                x0, y0 = (nw - size) // 2, (nh - size) // 2
                out = im[y0 : y0 + size, x0 : x0 + size]
            return np.ascontiguousarray(out[..., ::-1])  # BGR -> RGB

    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        if train:
            rng = rng if rng is not None else np.random.default_rng()
            x0, y0, cw, ch = _random_resized_crop_box(w, h, rng)
            im = im.resize(
                (size, size), Image.BILINEAR, box=(x0, y0, x0 + cw, y0 + ch)
            )
            if rng.random() < 0.5:
                im = im.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            short = int(round(size * 256 / 224))
            if w <= h:
                nw, nh = short, max(int(round(h * short / w)), short)
            else:
                nh, nw = short, max(int(round(w * short / h)), short)
            im = im.resize((nw, nh), Image.BILINEAR)
            x0, y0 = (nw - size) // 2, (nh - size) // 2
            im = im.crop((x0, y0, x0 + size, y0 + size))
        return np.asarray(im, np.uint8)


class ImageFolderLoader:
    """Epoch iterator over an image tree/manifest: shuffle -> threaded
    decode -> uint8 batches ``{"input": [B,S,S,3] u8, "label": [B] i32}``.

    Decode overlaps the consumer: each batch is submitted to the pool
    before the previous one is yielded (`prefetch_batches` deep), so on a
    multi-core host the chip never waits for PIL. Pairs with
    ``loaders.prefetch_to_device`` for the host->device side.
    """

    def __init__(
        self,
        root_or_manifest: str,
        batch_size: int,
        img_size: int = 224,
        train: bool = True,
        seed: int = 0,
        workers: int = 4,
        drop_last: bool = True,
        prefetch_batches: int = 2,
    ):
        if os.path.isdir(root_or_manifest):
            self.samples, self.classes = scan_image_folder(root_or_manifest)
        else:
            self.samples = read_manifest(root_or_manifest)
            self.classes = None
        self.batch_size = batch_size
        self.img_size = img_size
        self.train = train
        self.workers = max(1, workers)
        self.drop_last = drop_last
        self.prefetch_batches = max(1, prefetch_batches)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.samples)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import collections

        idx = np.arange(len(self.samples))
        if self.train:
            self._rng.shuffle(idx)
        end = (
            len(idx) - len(idx) % self.batch_size
            if self.drop_last
            else len(idx)
        )
        starts = list(range(0, end, self.batch_size))
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            # Only leaf decode_image tasks enter the pool (no nested
            # batch tasks -> no pool-starvation deadlock); the window
            # keeps prefetch_batches batches of futures in flight.
            def submit(start: int):
                sel = idx[start : start + self.batch_size]
                seeds = self._rng.integers(0, 2**31, len(sel))
                futs = [
                    pool.submit(
                        decode_image,
                        self.samples[i][0],
                        self.img_size,
                        self.train,
                        np.random.default_rng(s),
                    )
                    for i, s in zip(sel, seeds)
                ]
                return sel, futs

            window = collections.deque(
                submit(s) for s in starts[: self.prefetch_batches]
            )
            next_i = self.prefetch_batches
            while window:
                sel, futs = window.popleft()
                if next_i < len(starts):
                    window.append(submit(starts[next_i]))
                    next_i += 1
                imgs = np.stack([f.result() for f in futs])
                labels = np.asarray(
                    [self.samples[i][1] for i in sel], np.int32
                )
                yield {"input": imgs, "label": labels}
