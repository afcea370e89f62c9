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

from torch_twin import (TorchAttention, TorchBlock, TorchFiT,  # noqa: E402
                        TorchSwiGLU, rotate_half_t)


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




# ---------------------------------------------------------------------------
# 4. InceptionV3 golden (torchvision layout + pytorch-fid pooling patches)
# ---------------------------------------------------------------------------
# torchvision is not installed here, so we build an independent plain-torch
# InceptionV3 with torchvision's module naming and pytorch-fid's pooling
# patches (count_include_pad=False avg pools; Mixed_7c max-pool branch).
# Random-initialized (incl. random BN running stats) — this validates the
# flax architecture + BN-folding importer, the reference's trust anchor
# being the TF1 graph (/root/reference/fit/utils/evaluator.py:15-23).

import torch.nn as tnn


class _BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # 3x3/1 avg pool, count_include_pad=False (pytorch-fid)
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _IncA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avgp(x))
        return torch.cat([b1, b5, b3, bp], 1)


class _IncB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class _IncC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = _BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avgp(x))
        return torch.cat([b1, b7, bd, bp], 1)


class _IncD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _IncE(tnn.Module):
    def __init__(self, cin, max_pool=False):
        super().__init__()
        self.max_pool = max_pool
        self.branch1x1 = _BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = _BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.max_pool:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avgp(x)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class _TorchInceptionV3(tnn.Module):
    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280)
        self.Mixed_7c = _IncE(2048, max_pool=True)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        # flatten in NHWC order (TF/ADM convention, matches the flax port)
        spatial = x[:, :7].permute(0, 2, 3, 1).flatten(1)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        pool3 = x.mean(dim=(2, 3))
        return pool3, spatial, self.fc(pool3)


def gen_inception():
    torch.manual_seed(7)
    net = _TorchInceptionV3().eval()
    # randomize BN running stats so folding is actually exercised
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.05)
    imgs = torch.randint(0, 256, (4, 299, 299, 3), dtype=torch.uint8,
                         generator=torch.Generator().manual_seed(11))
    x = imgs.permute(0, 3, 1, 2).float() / 255.0 * 2.0 - 1.0
    with torch.no_grad():
        pool3, spatial, logits = net(x)
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if 'num_batches' not in k}
    np.savez(os.path.join(OUT, 'inception.npz'),
             images=imgs.numpy(), pool3=pool3.numpy(),
             spatial=spatial.numpy(), logits=logits.numpy(),
             **{'sd:' + k: v for k, v in sd.items()})
    print('wrote inception.npz')


# ---------------------------------------------------------------------------
# 5. Tiny diffusers-layout AutoencoderKL golden
# ---------------------------------------------------------------------------
# Independent plain-torch twin of the diffusers SD-VAE architecture
# (the reference loads stabilityai/sd-vae-ft-ema via diffusers,
# sample_fitv2_ddp.py:108-113) at a tiny config, with diffusers' module
# naming so the golden also exercises vae/torch_import.convert_vae_state_dict.


def _gn(c):
    return tnn.GroupNorm(min(32, c), c, eps=1e-6)


class _TResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = getattr(self, 'conv_shortcut', None)
        return (sc(x) if sc is not None else x) + h


class _TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = _gn(c)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).permute(0, 2, 1)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * (C ** -0.5), dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.permute(0, 2, 1).reshape(B, C, H, W)

    def state_dict(self, *a, **kw):  # diffusers names to_out.0
        sd = super().state_dict(*a, **kw)
        return {k.replace('to_out.0.', 'to_out.0.'): v for k, v in sd.items()}


class _TMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = tnn.ModuleList([_TResnet(c, c), _TResnet(c, c)])
        self.attentions = tnn.ModuleList([_TAttn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _TDown(tnn.Module):
    def __init__(self, cin, cout, layers, last):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [_TResnet(cin if j == 0 else cout, cout) for j in range(layers)])
        if not last:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(cout, cout, 3, stride=2)
            self.downsamplers = tnn.ModuleList([ds])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, 'downsamplers'):
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _TUp(tnn.Module):
    def __init__(self, cin, cout, layers, last):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [_TResnet(cin if j == 0 else cout, cout) for j in range(layers)])
        if not last:
            us = tnn.Module()
            us.conv = tnn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, 'upsamplers'):
            x = F.interpolate(x, scale_factor=2.0, mode='nearest')
            x = self.upsamplers[0].conv(x)
        return x


class _TinyVAE(tnn.Module):
    def __init__(self, chans=(8, 16), latent=4):
        super().__init__()
        n = len(chans)
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList([
            _TDown(chans[max(i - 1, 0)], chans[i], 2, i == n - 1)
            for i in range(n)])
        enc.mid_block = _TMid(chans[-1])
        enc.conv_norm_out = _gn(chans[-1])
        enc.conv_out = tnn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        dec = tnn.Module()
        rch = list(reversed(chans))
        dec.conv_in = tnn.Conv2d(latent, rch[0], 3, padding=1)
        dec.mid_block = _TMid(rch[0])
        dec.up_blocks = tnn.ModuleList([
            _TUp(rch[max(i - 1, 0)], rch[i], 3, i == n - 1)
            for i in range(n)])
        dec.conv_norm_out = _gn(rch[-1])
        dec.conv_out = tnn.Conv2d(rch[-1], 3, 3, padding=1)
        self.decoder = dec
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)

    def encode(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            h = blk(h)
        h = self.encoder.mid_block(h)
        h = F.silu(self.encoder.conv_norm_out(h))
        return self.quant_conv(self.encoder.conv_out(h))

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for blk in self.decoder.up_blocks:
            h = blk(h)
        h = F.silu(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)


def gen_vae():
    torch.manual_seed(3)
    net = _TinyVAE().eval()
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(5))
    z = torch.randn(2, 4, 4, 4, generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        moments = net.encode(x)
        img = net.decode(z)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez(os.path.join(OUT, 'vae.npz'),
             x=x.numpy(), z=z.numpy(), moments=moments.numpy(),
             decoded=img.numpy(), **{'sd:' + k: v for k, v in sd.items()})
    print('wrote vae.npz')




# ---------------------------------------------------------------------------
# 6. Mini OpenAI-CLIP visual tower golden
# ---------------------------------------------------------------------------
# Independent plain-torch twin of clip.model.VisionTransformer (the
# reference's clip branch, fit/utils/utils.py:301-320, loads
# clip.load('ViT-*/14').visual): conv1 without bias, class embedding,
# positional embedding, ln_pre, MultiheadAttention resblocks with quickGELU
# MLPs, ln_post + proj. State-dict keys use OpenAI clip naming so the
# golden also exercises convert_clip_visual_state_dict.


class _CLIPBlockT(tnn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(w, eps=1e-5)
        self.attn = tnn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(w, eps=1e-5)
        self.mlp = tnn.ModuleDict({'c_fc': tnn.Linear(w, 4 * w),
                                   'c_proj': tnn.Linear(4 * w, w)})

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.mlp['c_fc'](self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # quickGELU
        return x + self.mlp['c_proj'](h)


class _MiniCLIPVisual(tnn.Module):
    def __init__(self, img=32, patch=8, w=64, depth=3, heads=4, out=48):
        super().__init__()
        self.patch = patch
        self.conv1 = tnn.Conv2d(3, w, patch, stride=patch, bias=False)
        self.class_embedding = tnn.Parameter(torch.randn(w) * 0.1)
        n = (img // patch) ** 2 + 1
        self.positional_embedding = tnn.Parameter(torch.randn(n, w) * 0.1)
        self.ln_pre = tnn.LayerNorm(w, eps=1e-5)
        blocks = tnn.ModuleDict()
        self.resblocks_list = tnn.ModuleList(
            [_CLIPBlockT(w, heads) for _ in range(depth)])
        self.ln_post = tnn.LayerNorm(w, eps=1e-5)
        self.proj = tnn.Parameter(torch.randn(w, out) * 0.1)

    def state_dict_clip(self):
        """rename to OpenAI clip visual naming."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace('resblocks_list.', 'transformer.resblocks.')
            sd['visual.' + k] = v.numpy()
        return sd

    def forward(self, x):
        h = self.conv1(x)                       # (B, W, gh, gw)
        B, C, gh, gw = h.shape
        h = h.reshape(B, C, gh * gw).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(B, 1, C)
        h = torch.cat([cls, h], dim=1) + self.positional_embedding[None]
        h = self.ln_pre(h)
        for blk in self.resblocks_list:
            h = blk(h)
        tokens = h
        pooled = self.ln_post(h[:, 0]) @ self.proj
        return tokens, pooled


def gen_clip():
    torch.manual_seed(21)
    net = _MiniCLIPVisual().eval()
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        tokens, pooled = net(x)
    np.savez(os.path.join(OUT, 'clip.npz'),
             x=x.numpy(), tokens=tokens.numpy(), pooled=pooled.numpy(),
             **{'sd:' + k: v for k, v in net.state_dict_clip().items()})
    print('wrote clip.npz')


# ---------------------------------------------------------------------------
# 6. mini-DINOv2 golden (LayerScale + cls/register tokens + learned pos
#    embed + SwiGLU-fused FFN, torch-hub naming)
# ---------------------------------------------------------------------------


class _DinoBlockT(tnn.Module):
    def __init__(self, w, heads, swiglu):
        super().__init__()
        self.norm1 = tnn.LayerNorm(w, eps=1e-6)
        self.attn = tnn.ModuleDict({})
        self.attn.qkv = tnn.Linear(w, 3 * w)
        self.attn.proj = tnn.Linear(w, w)
        self.ls1 = tnn.ParameterDict(
            {'gamma': tnn.Parameter(torch.randn(w) * 0.1)})
        self.norm2 = tnn.LayerNorm(w, eps=1e-6)
        self.swiglu = swiglu
        self.mlp = tnn.ModuleDict({})
        if swiglu:
            hidden = (int(w * 4 * 2 / 3) + 7) // 8 * 8
            self.mlp.w12 = tnn.Linear(w, 2 * hidden)
            self.mlp.w3 = tnn.Linear(hidden, w)
        else:
            self.mlp.fc1 = tnn.Linear(w, 4 * w)
            self.mlp.fc2 = tnn.Linear(4 * w, w)
        self.ls2 = tnn.ParameterDict(
            {'gamma': tnn.Parameter(torch.randn(w) * 0.1)})
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads,
                                       C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = torch.einsum('bqhd,bkhd->bhqk', q, k)
        attn = torch.softmax(logits * (C // self.heads) ** -0.5, dim=-1)
        out = torch.einsum('bhqk,bkhd->bqhd', attn, v).reshape(B, N, C)
        x = x + self.ls1['gamma'] * self.attn.proj(out)
        h = self.norm2(x)
        if self.swiglu:
            a, b = self.mlp.w12(h).chunk(2, dim=-1)
            m = self.mlp.w3(F.silu(a) * b)
        else:
            m = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + self.ls2['gamma'] * m


class _MiniDinoV2(tnn.Module):
    def __init__(self, img=28, patch=7, w=48, depth=3, heads=4,
                 registers=2, swiglu=True):
        super().__init__()
        self.patch = patch
        self.patch_embed = tnn.ModuleDict({})
        self.patch_embed.proj = tnn.Conv2d(3, w, patch, stride=patch)
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.randn(1, 1, w) * 0.1)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + n, w) * 0.1)
        self.register_tokens = tnn.Parameter(
            torch.randn(1, registers, w) * 0.1)
        self.blocks = tnn.ModuleList(
            [_DinoBlockT(w, heads, swiglu) for _ in range(depth)])
        self.norm = tnn.LayerNorm(w, eps=1e-6)
        self.registers = registers

    def forward(self, x):
        h = self.patch_embed.proj(x)            # (B, W, gh, gw)
        B, C, gh, gw = h.shape
        h = h.reshape(B, C, gh * gw).permute(0, 2, 1)
        h = h + self.pos_embed[:, 1:]
        cls = self.cls_token + self.pos_embed[:, :1]
        h = torch.cat([cls.expand(B, 1, C),
                       self.register_tokens.expand(B, self.registers, C),
                       h], dim=1)
        for blk in self.blocks:
            h = blk(h)
        h = self.norm(h)
        return h[:, 1 + self.registers:]


def gen_dinov2():
    torch.manual_seed(33)
    net = _MiniDinoV2().eval()
    x = torch.randn(2, 3, 28, 28, generator=torch.Generator().manual_seed(5))
    with torch.no_grad():
        tokens = net(x)
    np.savez(os.path.join(OUT, 'dinov2.npz'),
             x=x.numpy(), tokens=tokens.numpy(),
             **{'sd:' + k: v.numpy() for k, v in net.state_dict().items()})
    print('wrote dinov2.npz')


# -- improved-diffusion respaced DDIM golden ---------------------------------
# Fully independent float64 numpy implementation of the IDDPM math
# (linear beta schedule, respaced subsequence betas, learned-range variance,
# eps -> x0 prediction, eta=0 DDIM update) so the JAX
# sched/gaussian_diffusion.py ladder + loop is anchored to something that
# shares no code with it. The "network" is a fixed analytic function
# implemented identically on both sides (see tests/test_ddpm_golden.py).

def _ddpm_analytic_model(x, t_orig, T):
    """eps + learned-range var_raw from pure elementwise math (no weights)."""
    tt = (np.asarray(t_orig, np.float64) / T)[:, None, None]
    lin = np.linspace(-1.0, 1.0, x.shape[-1])
    eps = 0.1 * x * np.cos(3.0 * tt) + 0.05 * np.sin(5.0 * tt + lin)
    var_raw = np.tanh(0.1 * x + lin * tt)
    return np.concatenate([eps, var_raw], axis=-1)


def gen_ddpm():
    T, n_resp = 100, 8
    # linear schedule, IDDPM scaling (scale = 1000/T)
    scale = 1000 / T
    betas_full = np.linspace(scale * 1e-4, scale * 0.02, T)
    # single-section respacing: round-accumulated stride over [0, T-1]
    stride = (T - 1) / (n_resp - 1)
    use_steps, cur = [], 0.0
    for _ in range(n_resp):
        use_steps.append(round(cur))
        cur += stride
    ac_full = np.cumprod(1.0 - betas_full)
    last = 1.0
    betas, tmap = [], []
    for i in range(T):
        if i in use_steps:
            betas.append(1.0 - ac_full[i] / last)
            last = ac_full[i]
            tmap.append(i)
    betas = np.array(betas)
    tmap = np.array(tmap, np.int64)

    ac = np.cumprod(1.0 - betas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    post_logvar_clipped = np.log(np.append(post_var[1], post_var[1:]))
    coef1 = betas * np.sqrt(ac_prev) / (1.0 - ac)
    coef2 = (1.0 - ac_prev) * np.sqrt(1.0 - betas) / (1.0 - ac)

    B, N, C = 2, 8, 4
    rs = np.random.RandomState(0)
    x_init = rs.randn(B, N, C)

    # eta=0 DDIM rollout, clip_denoised=False
    x = x_init.copy()
    for ti in range(n_resp - 1, -1, -1):
        t_orig = np.full((B,), tmap[ti])
        out = _ddpm_analytic_model(x, t_orig, T)
        eps = out[..., :C]
        pred_x0 = (np.sqrt(1.0 / ac[ti]) * x
                   - np.sqrt(1.0 / ac[ti] - 1.0) * eps)
        x = (pred_x0 * np.sqrt(ac_prev[ti])
             + np.sqrt(1.0 - ac_prev[ti]) * eps)
    x_final = x

    # p_mean_variance point golden at respaced t=3 (learned-range variance)
    t_pm = 3
    t_orig = np.full((B,), tmap[t_pm])
    out = _ddpm_analytic_model(x_init, t_orig, T)
    eps, var_raw = out[..., :C], out[..., C:]
    pred_x0 = (np.sqrt(1.0 / ac[t_pm]) * x_init
               - np.sqrt(1.0 / ac[t_pm] - 1.0) * eps)
    mean = coef1[t_pm] * pred_x0 + coef2[t_pm] * x_init
    frac = (var_raw + 1.0) / 2.0
    logvar = (frac * np.log(betas[t_pm])
              + (1.0 - frac) * post_logvar_clipped[t_pm])

    np.savez(os.path.join(OUT, 'ddpm.npz'),
             T=np.int64(T), n_resp=np.int64(n_resp), tmap=tmap,
             x_init=x_init, x_final=x_final,
             pmv_t=np.int64(t_pm), pmv_mean=mean, pmv_logvar=logvar,
             pmv_pred_xstart=pred_x0)
    print('wrote ddpm.npz  tmap =', tmap.tolist())


if __name__ == '__main__':
    gen_rope()
    gen_model_forward()
    gen_transport()
    gen_inception()
    gen_vae()
    gen_clip()
    gen_dinov2()
    gen_ddpm()
