"""Generate golden test tensors from the PyTorch reference at /root/reference.

Run once in an environment where torch + the reference repo are present:
    python tools/gen_goldens.py
Writes tests/goldens/*.npz which the JAX test-suite compares against.
The committed goldens make the tests self-contained (no torch / reference
needed at test time).

For the model-forward golden we build an independent plain-torch FiT equivalent
(the reference model itself imports timm, unavailable here); its state_dict
uses the reference's key naming so it also exercises the checkpoint importer.
"""

import math
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'goldens')
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# 1. RoPE goldens straight from the reference implementation
# ---------------------------------------------------------------------------

def gen_rope():
    from fit.model.rope import VisionRotaryEmbedding

    head_dim = 72  # FiTv2-XL head dim (1152/16)
    B, nh, nw = 2, 4, 8
    n = nh * nw
    gh, gw = torch.meshgrid(torch.arange(nw), torch.arange(nh), indexing='xy')
    grid = torch.cat([gh.reshape(1, -1), gw.reshape(1, -1)], dim=0)
    grid = grid.repeat(B, 1, 1).long()  # (B, 2, N), w first
    size = torch.tensor([nh, nw]).repeat(B, 1)[:, None, :].long()  # (B,1,2)

    out = {'grid': grid.numpy(), 'size': size.numpy(), 'head_dim': head_dim}

    modes = ['normal', 'linear', 'ntk-aware', 'ntk-aware-pro1', 'ntk-aware-pro2',
             'ntk-by-parts', 'yarn']
    for mode in modes:
        for decouple in ([False] if mode == 'normal' else [False, True]):
            kw = dict(head_dim=head_dim, custom_freqs=mode, theta=10000,
                      max_cached_len=64)
            if mode != 'normal':
                kw.update(max_pe_len_h=32, max_pe_len_w=48, decouple=decouple,
                          ori_max_pe_len=16)
            rope = VisionRotaryEmbedding(**kw)
            cos, sin = rope.get_cached_2d_rope_from_grid(grid)
            key = f'{mode}_dec{int(decouple)}'
            out[f'cos_{key}'] = cos.numpy()
            out[f'sin_{key}'] = sin.numpy()
            # online path. NOTE: the reference's online path crashes for
            # yarn / ntk-aware-pro1/2 (mscale/proportion are only set in the
            # cached-init branch, rope.py:156-160) — skip those; our JAX
            # implementation computes the post-scale per-sample instead.
            if mode in ('linear', 'ntk-aware', 'ntk-by-parts'):
                rope_on = VisionRotaryEmbedding(
                    head_dim=head_dim, custom_freqs=mode, theta=10000,
                    online_rope=True, decouple=decouple, ori_max_pe_len=16)
                cos_o, sin_o = rope_on.online_get_2d_rope_from_grid(
                    grid.float(), size)
                out[f'cos_online_{key}'] = cos_o.numpy()
                out[f'sin_online_{key}'] = sin_o.numpy()
    np.savez(os.path.join(OUT, 'rope.npz'), **out)
    print('wrote rope.npz with', len(out), 'arrays')


# ---------------------------------------------------------------------------
# 2. Independent plain-torch FiTv2 block/model for forward goldens
# ---------------------------------------------------------------------------

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


def gen_model_forward():
    from fit.model.rope import VisionRotaryEmbedding
    torch.manual_seed(42)
    dim, heads, depth, in_ch, p, ncls = 64, 4, 3, 4, 2, 10
    model = TorchFiT(dim, heads, depth, in_ch, p, ncls).eval()
    # randomize all params (incl. the normally zero-init ones) to make the
    # parity test strict
    with torch.no_grad():
        for prm in model.parameters():
            prm.uniform_(-0.3, 0.3)

    B, nh, nw = 2, 4, 6
    n_pad = 32  # pad to 32 tokens (valid 24)
    n = nh * nw
    gh, gw = torch.meshgrid(torch.arange(nw), torch.arange(nh), indexing='xy')
    grid = torch.cat([gh.reshape(1, -1), gw.reshape(1, -1)], dim=0)
    grid = F.pad(grid, (0, n_pad - n))
    grid = grid.repeat(B, 1, 1).long()
    mask = torch.zeros(B, n_pad)
    mask[:, :n] = 1.0

    rope = VisionRotaryEmbedding(head_dim=dim // heads, custom_freqs='normal',
                                 max_cached_len=64)
    cos, sin = rope.get_cached_2d_rope_from_grid(grid)

    x = torch.randn(B, n_pad, in_ch * p * p)
    t = torch.rand(B)
    y = torch.randint(0, ncls, (B,))
    with torch.no_grad():
        out = model(x, t, y, grid, mask, cos, sin)

    arrs = {
        'x': x.numpy(), 't': t.numpy(), 'y': y.numpy(), 'grid': grid.numpy(),
        'mask': mask.numpy(), 'out': out.numpy(),
        'dim': dim, 'heads': heads, 'depth': depth, 'in_ch': in_ch, 'p': p,
        'ncls': ncls,
    }
    # reference-style state_dict key naming for importer testing
    sd = model.state_dict()
    rename = {}
    for k, v in sd.items():
        k2 = (k.replace('adaLN_modulation.1.', 'adaLN_modulation$1$')
               .replace('adaLN_modulation.2.', 'adaLN_modulation$2$')
               .replace('mlp.0.', 'mlp$0$').replace('mlp.2.', 'mlp$2$'))
        k2 = k2.replace('$', '.')
        rename['sd.' + k2] = v.numpy()
    arrs.update(rename)
    np.savez(os.path.join(OUT, 'fit_forward.npz'), **arrs)
    print('wrote fit_forward.npz out shape', out.shape)


# ---------------------------------------------------------------------------
# 3. Transport (flow-matching) goldens: path plan + masked loss arithmetic
# ---------------------------------------------------------------------------

def gen_transport():
    # load path.py directly (the transport package __init__ pulls in
    # torchdiffeq, which is not installed here)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_path', os.path.join(REF, 'fit/scheduler/transport/path.py'))
    ref_path = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_path)
    ICPlan, GVPCPlan, VPCPlan = ref_path.ICPlan, ref_path.GVPCPlan, ref_path.VPCPlan
    torch.manual_seed(7)
    B, N, C = 3, 8, 4
    x0 = torch.randn(B, N, C)
    x1 = torch.randn(B, N, C)
    t = torch.rand(B)
    mask = torch.ones(B, N)
    mask[:, 6:] = 0
    pred = torch.randn(B, N, C)

    out = {'x0': x0.numpy(), 'x1': x1.numpy(), 't': t.numpy(),
           'mask': mask.numpy(), 'pred': pred.numpy()}
    for name, plan in [('linear', ICPlan()), ('gvp', GVPCPlan()),
                       ('vp', VPCPlan())]:
        _, xt, ut = plan.plan(t, x0, x1)
        out[f'xt_{name}'] = xt.numpy()
        out[f'ut_{name}'] = ut.numpy()
        # velocity-type masked loss (reference transport.py:152-157)
        ratio = float(mask.shape[-1]) / torch.count_nonzero(mask, dim=-1)
        loss = torch.mean((((pred - ut) * mask[..., None]) ** 2),
                          dim=(1, 2)) * ratio
        out[f'loss_{name}'] = loss.numpy()
        # drift/score conversions on velocity models
        sc = plan.get_score_from_velocity(pred, xt, t)
        out[f'score_from_v_{name}'] = sc.numpy()
    np.savez(os.path.join(OUT, 'transport.npz'), **out)
    print('wrote transport.npz')


if __name__ == '__main__':
    gen_rope()
    gen_model_forward()
    gen_transport()
