"""Per-modality CPU reference throughput: the reference-equivalent torch
pipeline (Data2Seq-style tokenizer + 12 timm Blocks, ``README.md:113-150``)
on this machine's single CPU core.

Produces ``scripts/cpu_reference.json`` — the denominator for the
BASELINE.json bar (">=5x CPU-reference throughput per modality").
``bench_modalities.py`` reads it to fill ``vs_baseline``.

The torch tokenizers here mirror the reference's ops (Conv2d patch embed,
Conv3d tubelet embed, AST Conv2d stride-10 spectrogram patches, Conv1d
token embedding, nn.Embedding for categorical ids, CLIP's width-512
12-layer text tower) at the exact token geometry the JAX pipeline uses, so
both sides push the same sequence shapes through the same-depth encoder.

Run (CPU, no TPU needed): ``PYTHONPATH=. python scripts/bench_modalities_cpu_ref.py``
"""

import json
import pathlib
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tests.torch_ref import make_encoder  # noqa: E402

torch.set_num_threads(1)  # one physical core on this machine anyway
torch.manual_seed(0)


class PointGroupEmbed(nn.Module):
    """Reference point tokenizer cost model: kNN-grouped mini-PointNet
    (PointCloud P2T group embed): per-group MLP over [B, G, K, C] + max."""

    def __init__(self, in_ch=3 + 3, dim=768):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(in_ch, 128), nn.GELU(), nn.Linear(128, dim)
        )

    def forward(self, grouped):  # [B, G, K, C]
        return self.mlp(grouped).amax(dim=2)


def pipelines():
    """modality -> (batch, make_input(), tokenizer_fn). Token geometry
    matches scripts/bench_modalities.py SPECS exactly."""
    d = 768
    enc = make_encoder(d, 12, 12, seed=0)

    def image_like(in_ch, batch):
        conv = nn.Conv2d(in_ch, d, 16, 16)
        x = torch.randn(batch, in_ch, 224, 224)
        return batch, x, lambda v: conv(v).flatten(2).transpose(1, 2)

    def seq_conv(c_in, t, batch):
        conv = nn.Conv1d(c_in, d, 3, padding=1, padding_mode="circular")
        x = torch.randn(batch, t, c_in)
        return batch, x, lambda v: conv(v.transpose(1, 2)).transpose(1, 2)

    specs = {}
    specs["image"] = image_like(3, 8)
    specs["infrared"] = image_like(1, 8)
    specs["x-ray"] = image_like(3, 8)

    tube = nn.Conv3d(3, d, (2, 16, 16), (2, 16, 16))
    vx = torch.randn(1, 3, 16, 224, 224)
    specs["video"] = (1, vx, lambda v: tube(v).flatten(2).transpose(1, 2))

    ast = nn.Conv2d(1, d, 16, 10)  # AST fstride=tstride=10 -> 12x101 tokens
    ax = torch.randn(2, 1, 1024, 128)
    specs["audio"] = (2, ax, lambda v: ast(v).flatten(2).transpose(1, 2))

    pe = PointGroupEmbed()
    px = torch.randn(4, 256, 32, 6)  # 1024 pts -> 256 FPS groups of 32
    specs["point"] = (4, px, pe)

    specs["time-series"] = seq_conv(7, 96, 32)
    specs["imu"] = seq_conv(6, 256, 8)

    tab = nn.Embedding(8 * 14, d)
    tx = torch.randint(0, 8 * 14, (64, 14))
    specs["tabular"] = (64, tx, tab)

    hyp = nn.Linear(49, d)
    hx = torch.randn(8, 200, 49)
    specs["hyper"] = (8, hx, hyp)

    # CLIP text tower: 12 layers x width 512 over T=77, then zero-pad 768.
    text_tower = make_encoder(512, 12, 8, seed=1)
    text_emb = nn.Embedding(49408, 512)
    ttx = torch.randint(1, 49000, (8, 77))

    def text_tok(v):
        h = text_tower(text_emb(v))
        return nn.functional.pad(h, (0, d - 512))

    specs["text"] = (8, ttx, text_tok)

    # TokenGT: node+edge id embeddings + lap eigvec projection, T=32+48.
    g_emb = nn.Embedding(512 * 9, d)
    lap_proj = nn.Linear(16, d)
    gx = (
        torch.randint(0, 512, (16, 80, 3)),
        torch.randn(16, 80, 16),
    )

    def graph_tok(v):
        ids, lap = v
        return g_emb(ids).sum(2) + lap_proj(lap)

    specs["graph"] = (16, gx, graph_tok)

    return enc, specs


@torch.no_grad()
def main():
    enc, specs = pipelines()
    out = {}
    for m, (batch, x, tok) in specs.items():
        fn = lambda: enc(tok(x))  # noqa: E731
        y = fn()  # warmup
        assert torch.isfinite(y).all(), m
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        seq_s = batch / dt
        out[m] = {
            "seq_s": round(seq_s, 3),
            "batch": batch,
            "tokens": int(y.shape[1]),
            "sec_per_batch": round(dt, 3),
        }
        print(m, out[m], flush=True)
    path = pathlib.Path(__file__).with_name("cpu_reference.json")
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
