"""VAE: shapes, importer coverage vs a synthetic torch-style state dict,
and numerical parity of one decode against a torch re-implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.vae import (
    AutoencoderKL, convert_vae_state_dict, latents_to_images_uint8,
)


def _tiny_vae():
    return AutoencoderKL(block_out_channels=(8, 16), latent_channels=4)


def _synthetic_torch_sd(rng, n_levels=2, enc_layers=2, dec_layers=3,
                        ch=(8, 16), latent=4):
    """Diffusers-style state dict with random values, torch layouts."""
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[name + '.weight'] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[name + '.bias'] = rng.standard_normal(cout).astype(np.float32) * 0.01

    def dense(name, cin, cout):
        sd[name + '.weight'] = rng.standard_normal(
            (cout, cin)).astype(np.float32) * 0.05
        sd[name + '.bias'] = rng.standard_normal(cout).astype(np.float32) * 0.01

    def norm(name, c):
        sd[name + '.weight'] = 1 + rng.standard_normal(c).astype(np.float32) * 0.01
        sd[name + '.bias'] = rng.standard_normal(c).astype(np.float32) * 0.01

    def resnet(pre, cin, cout):
        norm(pre + '.norm1', cin)
        conv(pre + '.conv1', cin, cout)
        norm(pre + '.norm2', cout)
        conv(pre + '.conv2', cout, cout)
        if cin != cout:
            conv(pre + '.conv_shortcut', cin, cout, k=1)

    def mid(pre, c):
        resnet(pre + '.resnets.0', c, c)
        norm(pre + '.attentions.0.group_norm', c)
        for n in ('to_q', 'to_k', 'to_v'):
            dense(f'{pre}.attentions.0.{n}', c, c)
        dense(pre + '.attentions.0.to_out.0', c, c)
        resnet(pre + '.resnets.1', c, c)

    # encoder
    conv('encoder.conv_in', 3, ch[0])
    cin = ch[0]
    for i, c in enumerate(ch):
        for j in range(enc_layers):
            resnet(f'encoder.down_blocks.{i}.resnets.{j}',
                   cin if j == 0 else c, c)
        cin = c
        if i < n_levels - 1:
            conv(f'encoder.down_blocks.{i}.downsamplers.0.conv', c, c)
    mid('encoder.mid_block', ch[-1])
    norm('encoder.conv_norm_out', ch[-1])
    conv('encoder.conv_out', ch[-1], 2 * latent)
    # decoder
    rev = list(reversed(ch))
    conv('decoder.conv_in', latent, rev[0])
    mid('decoder.mid_block', rev[0])
    cin = rev[0]
    for i, c in enumerate(rev):
        for j in range(dec_layers):
            resnet(f'decoder.up_blocks.{i}.resnets.{j}',
                   cin if j == 0 else c, c)
        cin = c
        if i < n_levels - 1:
            conv(f'decoder.up_blocks.{i}.upsamplers.0.conv', c, c)
    norm('decoder.conv_norm_out', rev[-1])
    conv('decoder.conv_out', rev[-1], 3)
    conv('quant_conv', 2 * latent, 2 * latent, k=1)
    conv('post_quant_conv', latent, latent, k=1)
    return sd


def test_importer_covers_init_tree():
    model = _tiny_vae()
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(0)
    sd = _synthetic_torch_sd(rng)
    imported = convert_vae_state_dict(sd, n_levels=2)
    init_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(variables['params'])}
    imp_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(imported)}
    assert init_flat == imp_flat


def test_decode_matches_torch_reimplementation():
    """Parity of the flax decoder vs an independent torch NCHW evaluation
    of the same weights (GroupNorm/SiLU/conv/attention/nearest-upsample)."""
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    sd = _synthetic_torch_sd(rng)
    params = convert_vae_state_dict(sd, n_levels=2)
    model = _tiny_vae()

    z = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    out = model.apply({'params': params}, jnp.asarray(z),
                      method=model.decode)

    # torch evaluation
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def conv(x, pre, stride=1, pad=1):
        return F.conv2d(x, t[pre + '.weight'], t[pre + '.bias'],
                        stride=stride, padding=pad)

    def gnorm(x, pre):
        return F.group_norm(x, 32 if x.shape[1] >= 32 else x.shape[1],
                            t[pre + '.weight'], t[pre + '.bias'], eps=1e-6)

    def resnet(x, pre):
        h = conv(F.silu(gnorm(x, pre + '.norm1')), pre + '.conv1')
        h = conv(F.silu(gnorm(h, pre + '.norm2')), pre + '.conv2')
        if pre + '.conv_shortcut.weight' in t:
            x = conv(x, pre + '.conv_shortcut', pad=0)
        return x + h

    def attn(x, pre):
        B, C, H, W = x.shape
        h = gnorm(x, pre + '.group_norm').reshape(B, C, H * W).permute(0, 2, 1)
        q = h @ t[pre + '.to_q.weight'].T + t[pre + '.to_q.bias']
        k = h @ t[pre + '.to_k.weight'].T + t[pre + '.to_k.bias']
        v = h @ t[pre + '.to_v.weight'].T + t[pre + '.to_v.bias']
        a = torch.softmax(q @ k.permute(0, 2, 1) * (C ** -0.5), dim=-1)
        o = a @ v
        o = o @ t[pre + '.to_out.0.weight'].T + t[pre + '.to_out.0.bias']
        return x + o.permute(0, 2, 1).reshape(B, C, H, W)

    with torch.no_grad():
        x = torch.from_numpy(z.transpose(0, 3, 1, 2))
        x = conv(x, 'post_quant_conv', pad=0)
        x = conv(x, 'decoder.conv_in')
        x = resnet(x, 'decoder.mid_block.resnets.0')
        x = attn(x, 'decoder.mid_block.attentions.0')
        x = resnet(x, 'decoder.mid_block.resnets.1')
        for i in range(2):
            for j in range(3):
                x = resnet(x, f'decoder.up_blocks.{i}.resnets.{j}')
            if i < 1:
                x = F.interpolate(x, scale_factor=2, mode='nearest')
                x = conv(x, f'decoder.up_blocks.{i}.upsamplers.0.conv')
        x = F.silu(gnorm(x, 'decoder.conv_norm_out'))
        x = conv(x, 'decoder.conv_out')
    expect = x.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_encode_decode_shapes():
    model = _tiny_vae()
    x = jnp.zeros((2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    mean, logvar = model.apply(variables, x, method=model.encode)
    # two levels -> one downsample -> factor 2
    assert mean.shape == (2, 8, 8, 4)
    img = model.apply(variables, mean, method=model.decode)
    assert img.shape == (2, 16, 16, 3)


def test_uint8_conversion():
    x = jnp.array([[-1.5, -1.0, 0.0, 1.0, 1.5]])
    out = np.asarray(latents_to_images_uint8(x))
    np.testing.assert_array_equal(out, [[0, 0, 128, 255, 255]])
