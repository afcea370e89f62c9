"""Independent plain-torch FiTv2 twin, parameterizable up to the XL config.

Mirrors the reference model math (/root/reference/fit/model/fit_model.py:189-233,
modules.py:120-296: use_sit + SwiGLU + QK-LayerNorm + AdaLN-LoRA) without
importing the reference or timm. Used two ways:

  - tools/gen_goldens.py builds committed tiny-shape goldens from it;
  - tests/test_xl_scale_goldens.py instantiates it at the FULL FiTv2-XL
    config at test time (a 2.7 GB golden cannot be committed) and compares
    the JAX model / importer / sampler rollout against it directly.

RoPE cos/sin tables are passed in (interleaved layout, torch rotate_half
convention); table construction itself is golden-anchored separately
(tests/test_rope.py vs reference rope.py outputs).
"""

import math

import torch
import torch.nn.functional as F


def rotate_half_t(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return torch.stack((-x2, x1), dim=-1).reshape(x.shape)


class TorchSwiGLU(torch.nn.Module):
    def __init__(self, dim, hidden, bias=True):
        super().__init__()
        self.fc1_g = torch.nn.Linear(dim, hidden, bias=bias)
        self.fc1_x = torch.nn.Linear(dim, hidden, bias=bias)
        self.fc2 = torch.nn.Linear(hidden, dim, bias=bias)

    def forward(self, x):
        return self.fc2(F.silu(self.fc1_g(x)) * self.fc1_x(x))


class TorchAttention(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.dh = dim // heads
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, mask, cos, sin):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, self.dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)  # (B, H, N, Dh)
        q = F.layer_norm(q, (self.dh,), eps=1e-6)
        k = F.layer_norm(k, (self.dh,), eps=1e-6)
        q = q * cos + rotate_half_t(q) * sin
        k = k * cos + rotate_half_t(k) * sin
        am = mask[:, None, None, :]
        am = am == am.transpose(-2, -1)
        x = F.scaled_dot_product_attention(q, k, v, attn_mask=am)
        x = x.transpose(1, 2).reshape(B, N, C)
        x = x * mask[..., None]
        return self.proj(x)


class TorchBlock(torch.nn.Module):
    def __init__(self, dim, heads, lora_dim):
        super().__init__()
        self.attn = TorchAttention(dim, heads)
        self.mlp = TorchSwiGLU(dim, (int(dim * 4) * 2) // 3)
        self.adaLN_modulation = torch.nn.Sequential(
            torch.nn.SiLU(), torch.nn.Linear(dim, lora_dim),
            torch.nn.Linear(lora_dim, 6 * dim))

    def forward(self, x, c, mask, cos, sin, g):
        mod = self.adaLN_modulation(c) + g
        sm, cm, gm, s2, c2, g2 = mod.chunk(6, dim=1)
        h = F.layer_norm(x, x.shape[-1:], eps=1e-6)
        h = h * (1 + cm.unsqueeze(1)) + sm.unsqueeze(1)
        x = x + gm.unsqueeze(1) * self.attn(h, mask, cos, sin)
        h = F.layer_norm(x, x.shape[-1:], eps=1e-6)
        h = h * (1 + c2.unsqueeze(1)) + s2.unsqueeze(1)
        x = x + g2.unsqueeze(1) * self.mlp(h)
        return x


class TorchFiT(torch.nn.Module):
    """Mirror of FiTv2 (use_sit, swiglu, qk-layernorm, adaln-lora)."""

    def __init__(self, dim=64, heads=4, depth=3, in_ch=4, p=2, ncls=10,
                 lora_dim=16):
        super().__init__()
        self.p, self.in_ch = p, in_ch

        class XE(torch.nn.Module):
            def __init__(s):
                super().__init__()
                s.proj = torch.nn.Linear(in_ch * p * p, dim)

            def forward(s, x):
                return s.proj(x)

        class TE(torch.nn.Module):
            def __init__(s):
                super().__init__()
                s.mlp = torch.nn.Sequential(
                    torch.nn.Linear(256, dim), torch.nn.SiLU(),
                    torch.nn.Linear(dim, dim))

            def forward(s, t):
                half = 128
                freqs = torch.exp(-math.log(10000) *
                                  torch.arange(half, dtype=torch.float32) / half)
                args = t[:, None].float() * freqs[None]
                emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
                return s.mlp(emb)

        class YE(torch.nn.Module):
            def __init__(s):
                super().__init__()
                s.embedding_table = torch.nn.Embedding(ncls + 1, dim)

            def forward(s, y):
                return s.embedding_table(y)

        self.x_embedder = XE()
        self.t_embedder = TE()
        self.y_embedder = YE()
        self.global_adaLN_modulation = torch.nn.Sequential(
            torch.nn.SiLU(), torch.nn.Linear(dim, 6 * dim))
        self.blocks = torch.nn.ModuleList(
            [TorchBlock(dim, heads, lora_dim) for _ in range(depth)])

        class FL(torch.nn.Module):
            def __init__(s):
                super().__init__()
                s.linear = torch.nn.Linear(dim, p * p * in_ch)
                s.adaLN_modulation = torch.nn.Sequential(
                    torch.nn.SiLU(), torch.nn.Linear(dim, 2 * dim))

            def forward(s, x, c):
                sh, sc = s.adaLN_modulation(c).chunk(2, dim=1)
                x = F.layer_norm(x, x.shape[-1:], eps=1e-6)
                x = x * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
                return s.linear(x)

        self.final_layer = FL()
        self.dim, self.heads = dim, heads

    def forward(self, x, t, y, grid, mask, cos, sin):
        x = self.x_embedder(x)
        c = self.t_embedder(t) + self.y_embedder(y)
        g = self.global_adaLN_modulation(c)
        cosu, sinu = cos.unsqueeze(1), sin.unsqueeze(1)
        for blk in self.blocks:
            x = blk(x, c, mask, cosu, sinu, g)
        x = self.final_layer(x, c)
        return x * mask[..., None]
