"""Clean-room PyTorch reference of the timm ViT ``Block`` used by the
reference's shared encoder (``/root/reference/README.md:124-135``).

Used ONLY in tests as the numerical oracle: it produces state dicts with
the exact key layout of the released checkpoints
(``{i}.attn.qkv.weight`` etc.), so the converter + JAX encoder are tested
end-to-end against torch without needing the (undownloadable) weights.
"""

import torch
import torch.nn as nn


class Attention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, t, d = x.shape
        qkv = self.qkv(x).reshape(b, t, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)  # [3, B, H, T, hd]
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        if mask is not None:  # mask: [B, T] bool keep-mask
            attn = attn.masked_fill(~mask[:, None, None, :], float("-inf"))
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    """Pre-LN transformer block, timm semantics (LN eps=1e-5, erf GELU)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, mask=None):
        x = x + self.attn(self.norm1(x), mask)
        x = x + self.mlp(self.norm2(x))
        return x


def make_encoder(dim=768, depth=12, num_heads=12, seed=0):
    torch.manual_seed(seed)
    blocks = nn.Sequential(*[Block(dim, num_heads) for _ in range(depth)])
    # Perturb from default init so the test is not trivially symmetric.
    with torch.no_grad():
        for p in blocks.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return blocks.eval()


# ---------------------------------------------------------------------------
# BEiT oracle (mmseg_custom/models/backbones/base/beit.py:61-186 semantics:
# split q/v biases, per-layer rel-pos-bias table, LayerScale gammas)
# ---------------------------------------------------------------------------


class BEiTAttention(nn.Module):
    def __init__(self, dim, num_heads, window):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        wh, ww = window
        self.window_size = window
        nrd = (2 * wh - 1) * (2 * ww - 1) + 3
        self.relative_position_bias_table = nn.Parameter(torch.zeros(nrd, num_heads))
        coords = torch.stack(
            torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing="ij")
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += wh - 1
        rel[:, :, 1] += ww - 1
        rel[:, :, 0] *= 2 * ww - 1
        n = wh * ww
        idx = torch.zeros((n + 1, n + 1), dtype=rel.dtype)
        idx[1:, 1:] = rel.sum(-1)
        idx[0, 0:] = nrd - 3
        idx[0:, 0] = nrd - 2
        idx[0, 0] = nrd - 1
        self.register_buffer("relative_position_index", idx)

    def forward(self, x):
        b, t, d = x.shape
        qkv_bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias)
        )
        qkv = nn.functional.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, t, 3, self.num_heads, self.head_dim).permute(
            2, 0, 3, 1, 4
        )
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(t, t, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(x)


class BEiTBlock(nn.Module):
    def __init__(self, dim, num_heads, window, mlp_ratio=4.0, init_values=0.1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BEiTAttention(dim, num_heads, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


def make_beit_encoder(dim=64, depth=2, num_heads=2, window=(4, 4), seed=0):
    torch.manual_seed(seed)
    blocks = nn.Sequential(
        *[BEiTBlock(dim, num_heads, window) for _ in range(depth)]
    )
    with torch.no_grad():
        for p in blocks.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return blocks.eval()


class UniPerceiverLayer(nn.Module):
    """BertLayer (uniperceiver.py:111-150): pre-norm attention + FFN with
    zero-init LayerScale; in_proj carries a full qkv bias."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.num_heads = num_heads
        self.in_proj = nn.Linear(dim, 3 * dim, bias=True)
        self.out_proj = nn.Linear(dim, dim)
        self.linear1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.linear2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.gamma_1 = nn.Parameter(torch.zeros(dim))
        self.gamma_2 = nn.Parameter(torch.zeros(dim))

    def attn(self, x):
        b, t, c = x.shape
        h = self.num_heads
        qkv = self.in_proj(x).reshape(b, t, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        a = a.softmax(dim=-1)
        out = (a @ v).transpose(1, 2).reshape(b, t, c)
        return self.out_proj(out)

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        h = self.linear2(torch.nn.functional.gelu(self.linear1(self.norm2(x))))
        return x + self.gamma_2 * h


def make_uniperceiver_encoder(dim=64, depth=2, num_heads=2, seed=0):
    torch.manual_seed(seed)
    blocks = nn.Sequential(
        *[UniPerceiverLayer(dim, num_heads) for _ in range(depth)]
    )
    with torch.no_grad():
        for p in blocks.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return blocks.eval()
