"""Import diffusers AutoencoderKL torch weights into the flax VAE.

Replaces ``AutoencoderKL.from_pretrained('stabilityai/sd-vae-ft-ema')``
(/root/reference/sample_fitv2_ddp.py:108-113) with a key-mapping conversion
from the published safetensors/bin state dict to fitv2_tpu.vae.AutoencoderKL's
param layout. Handles both modern attention names (to_q/to_k/to_v/to_out.0)
and legacy ones (query/key/value/proj_attn).

Weight transforms: torch conv (O,I,kh,kw) -> flax (kh,kw,I,O); attention 1x1
projections stored as Linear (O,I) or conv (O,I,1,1) -> flax Dense (I,O);
norms copy as {scale,bias}.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(sd: Dict[str, np.ndarray], tname: str, out: Dict[str, np.ndarray],
          fpath: str) -> None:
    w = sd.pop(tname + '.weight')
    out[fpath + '/kernel'] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    b = sd.pop(tname + '.bias', None)
    if b is not None:
        out[fpath + '/bias'] = b


def _dense(sd, tname, out, fpath) -> None:
    w = sd.pop(tname + '.weight')
    if w.ndim == 4:  # stored as 1x1 conv
        w = w[:, :, 0, 0]
    out[fpath + '/kernel'] = np.ascontiguousarray(w.T)
    b = sd.pop(tname + '.bias', None)
    if b is not None:
        out[fpath + '/bias'] = b


def _norm(sd, tname, out, fpath) -> None:
    out[fpath + '/norm/scale'] = sd.pop(tname + '.weight')
    out[fpath + '/norm/bias'] = sd.pop(tname + '.bias')


def _resnet(sd, tpre: str, out, fpre: str) -> None:
    _norm(sd, f'{tpre}.norm1', out, f'{fpre}/norm1')
    _conv(sd, f'{tpre}.conv1', out, f'{fpre}/conv1')
    _norm(sd, f'{tpre}.norm2', out, f'{fpre}/norm2')
    _conv(sd, f'{tpre}.conv2', out, f'{fpre}/conv2')
    if f'{tpre}.conv_shortcut.weight' in sd:
        _conv(sd, f'{tpre}.conv_shortcut', out, f'{fpre}/conv_shortcut')


def _attn(sd, tpre: str, out, fpre: str) -> None:
    legacy = f'{tpre}.query.weight' in sd
    _norm(sd, f'{tpre}.group_norm', out, f'{fpre}/group_norm')
    if legacy:
        _dense(sd, f'{tpre}.query', out, f'{fpre}/to_q')
        _dense(sd, f'{tpre}.key', out, f'{fpre}/to_k')
        _dense(sd, f'{tpre}.value', out, f'{fpre}/to_v')
        _dense(sd, f'{tpre}.proj_attn', out, f'{fpre}/to_out')
    else:
        _dense(sd, f'{tpre}.to_q', out, f'{fpre}/to_q')
        _dense(sd, f'{tpre}.to_k', out, f'{fpre}/to_k')
        _dense(sd, f'{tpre}.to_v', out, f'{fpre}/to_v')
        _dense(sd, f'{tpre}.to_out.0', out, f'{fpre}/to_out')


def _mid(sd, tpre: str, out, fpre: str) -> None:
    _resnet(sd, f'{tpre}.resnets.0', out, f'{fpre}/resnets_0')
    _attn(sd, f'{tpre}.attentions.0', out, f'{fpre}/attentions_0')
    _resnet(sd, f'{tpre}.resnets.1', out, f'{fpre}/resnets_1')


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_vae_state_dict(sd: Dict[str, np.ndarray], *, n_levels: int = 4,
                           enc_layers: int = 2, dec_layers: int = 3,
                           strict: bool = True) -> Dict[str, Any]:
    sd = dict(sd)
    flat: Dict[str, np.ndarray] = {}

    _conv(sd, 'encoder.conv_in', flat, 'encoder/conv_in')
    for i in range(n_levels):
        for j in range(enc_layers):
            _resnet(sd, f'encoder.down_blocks.{i}.resnets.{j}', flat,
                    f'encoder/down_{i}_resnets_{j}')
        if i < n_levels - 1:
            _conv(sd, f'encoder.down_blocks.{i}.downsamplers.0.conv', flat,
                  f'encoder/down_{i}_downsample/conv')
    _mid(sd, 'encoder.mid_block', flat, 'encoder/mid_block')
    _norm(sd, 'encoder.conv_norm_out', flat, 'encoder/conv_norm_out')
    _conv(sd, 'encoder.conv_out', flat, 'encoder/conv_out')

    _conv(sd, 'decoder.conv_in', flat, 'decoder/conv_in')
    _mid(sd, 'decoder.mid_block', flat, 'decoder/mid_block')
    for i in range(n_levels):
        for j in range(dec_layers):
            _resnet(sd, f'decoder.up_blocks.{i}.resnets.{j}', flat,
                    f'decoder/up_{i}_resnets_{j}')
        if i < n_levels - 1:
            _conv(sd, f'decoder.up_blocks.{i}.upsamplers.0.conv', flat,
                  f'decoder/up_{i}_upsample/conv')
    _norm(sd, 'decoder.conv_norm_out', flat, 'decoder/conv_norm_out')
    _conv(sd, 'decoder.conv_out', flat, 'decoder/conv_out')

    _conv(sd, 'quant_conv', flat, 'quant_conv')
    _conv(sd, 'post_quant_conv', flat, 'post_quant_conv')

    if sd and strict:
        raise ValueError(f'unconverted VAE keys: {sorted(sd)[:8]}...')
    return _nest(flat)


def load_vae_params(path: str, **kwargs) -> Dict[str, Any]:
    from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
    return convert_vae_state_dict(load_torch_state_dict(path), **kwargs)
