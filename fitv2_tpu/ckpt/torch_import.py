"""Import published PyTorch FiT/FiTv2 checkpoints into flax param trees.

Replaces the reference's ``init_from_ckpt`` (/root/reference/fit/utils/
eval_utils.py:12-73): loads ``.safetensors`` or ``.bin`` state dicts, strips
``_orig_mod.`` / ``module.`` prefixes, applies ignore-key patterns, and maps
reference parameter names onto this package's flax layout:

  torch name                                flax path
  ----------                                ---------
  x_embedder.proj.weight                    x_embedder/proj/kernel (transposed)
  t_embedder.mlp.{0,2}.*                    t_embedder/mlp_{0,2}/*
  y_embedder.embedding_table.weight         y_embedder/embedding_table
  global_adaLN_modulation.1.*               global_adaLN_modulation/fc_out/*
  blocks.N.attn.qkv.*                       blocks/block/attn/qkv/* [stacked]
  blocks.N.attn.{q,k}_norm.weight           .../attn/{q,k}_norm/weight
  blocks.N.mlp.{fc1_g,fc1_x,fc2,fc1}.*      .../mlp/*
  blocks.N.adaLN_modulation.1.* (normal)    .../adaLN_modulation/fc_out/*
  blocks.N.adaLN_modulation.{1,2}.* (lora)  .../adaLN_modulation/{fc1,fc_out}/*
  blocks.N.adaLN_modulation.{fc1_g,...}     .../adaLN_modulation/* (swiglu)
  final_layer.linear.*                      final_layer/linear/*
  final_layer.adaLN_modulation.1.*          final_layer/adaLN_modulation/fc_out/*

With ``scan_blocks=True`` (the default model config) all per-block tensors are
stacked along a new leading depth axis to match the nn.scan parameter layout.
Linear weights are transposed (torch stores (out, in); flax kernels are
(in, out)).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.pt state dict as numpy arrays."""
    if path.endswith('.safetensors'):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework='np') as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for pref in ('_orig_mod.', 'module.', 'model.'):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _map_linear(flat: Dict[str, np.ndarray], tname: str, fpath: str,
                sd: Dict[str, np.ndarray]):
    w = sd.pop(tname + '.weight', None)
    if w is not None:
        flat[fpath + '/kernel'] = np.ascontiguousarray(w.T)
    b = sd.pop(tname + '.bias', None)
    if b is not None:
        flat[fpath + '/bias'] = b


def _map_norm(flat: Dict[str, np.ndarray], tname: str, fpath: str,
              sd: Dict[str, np.ndarray]):
    w = sd.pop(tname + '.weight', None)
    if w is not None:
        flat[fpath + '/weight'] = w


def _map_adaln(flat, tprefix: str, fprefix: str, sd, adaln_type: str):
    if adaln_type == 'lora':
        _map_linear(flat, tprefix + '.1', fprefix + '/fc1', sd)
        _map_linear(flat, tprefix + '.2', fprefix + '/fc_out', sd)
    elif adaln_type == 'swiglu':
        for n in ('fc1_g', 'fc1_x', 'fc2'):
            _map_linear(flat, f'{tprefix}.{n}', f'{fprefix}/{n}', sd)
    else:  # 'normal'
        _map_linear(flat, tprefix + '.1', fprefix + '/fc_out', sd)


def convert_fit_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    depth: int,
    adaln_type: str = 'normal',
    scan_blocks: bool = True,
    ignore_keys: Optional[List[str]] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Map a reference FiT state dict to this package's flax params tree."""
    sd = dict(_strip_prefixes(sd))
    if ignore_keys:
        pats = [re.compile(p) for p in ignore_keys]
        sd = {k: v for k, v in sd.items()
              if not any(p.search(k) for p in pats)}

    flat: Dict[str, np.ndarray] = {}

    _map_linear(flat, 'x_embedder.proj', 'x_embedder/proj', sd)
    _map_linear(flat, 't_embedder.mlp.0', 't_embedder/mlp_0', sd)
    _map_linear(flat, 't_embedder.mlp.2', 't_embedder/mlp_2', sd)
    emb = sd.pop('y_embedder.embedding_table.weight', None)
    if emb is not None:
        flat['y_embedder/embedding_table'] = emb
    if any(k.startswith('global_adaLN_modulation') for k in sd):
        _map_adaln(flat, 'global_adaLN_modulation', 'global_adaLN_modulation',
                   sd, 'normal')

    # per-block tensors
    block_flat: List[Dict[str, np.ndarray]] = []
    for i in range(depth):
        bf: Dict[str, np.ndarray] = {}
        pre = f'blocks.{i}'
        _map_linear(bf, f'{pre}.attn.qkv', 'attn/qkv', sd)
        _map_linear(bf, f'{pre}.attn.proj', 'attn/proj', sd)
        _map_norm(bf, f'{pre}.attn.q_norm', 'attn/q_norm', sd)
        _map_norm(bf, f'{pre}.attn.k_norm', 'attn/k_norm', sd)
        _map_norm(bf, f'{pre}.norm1', 'norm1', sd)
        _map_norm(bf, f'{pre}.norm2', 'norm2', sd)
        for n in ('fc1_g', 'fc1_x', 'fc2', 'fc1'):
            _map_linear(bf, f'{pre}.mlp.{n}', f'mlp/{n}', sd)
        _map_adaln(bf, f'{pre}.adaLN_modulation', 'adaLN_modulation', sd,
                   adaln_type)
        block_flat.append(bf)

    if scan_blocks:
        keys = block_flat[0].keys()
        for i, bf in enumerate(block_flat):
            assert bf.keys() == keys, f'block {i} param mismatch'
        for k in keys:
            flat[f'blocks/block/{k}'] = np.stack(
                [bf[k] for bf in block_flat], axis=0)
    else:
        for i, bf in enumerate(block_flat):
            for k, v in bf.items():
                flat[f'blocks_{i}/{k}'] = v

    _map_linear(flat, 'final_layer.linear', 'final_layer/linear', sd)
    fl_adaln = 'swiglu' if adaln_type == 'swiglu' else 'normal'
    _map_adaln(flat, 'final_layer.adaLN_modulation', 'final_layer/adaLN_modulation',
               sd, fl_adaln)
    _map_norm(flat, 'final_layer.norm_final', 'final_layer/norm_final', sd)

    leftovers = [k for k in sd if not k.startswith('rel_pos_embed.')
                 and '.attn.rel_pos_embed' not in k]
    if leftovers and strict:
        raise ValueError(f'unconverted reference keys: {leftovers[:10]}'
                         f'{"..." if len(leftovers) > 10 else ""}')
    return _nest(flat)


def init_from_ckpt(path: str, *, depth: int, adaln_type: str = 'normal',
                   scan_blocks: bool = True,
                   ignore_keys: Optional[List[str]] = None,
                   verbose: bool = True) -> Dict[str, Any]:
    """Reference-API-shaped loader: path -> flax params."""
    sd = load_torch_state_dict(path)
    params = convert_fit_state_dict(
        sd, depth=depth, adaln_type=adaln_type, scan_blocks=scan_blocks,
        ignore_keys=ignore_keys)
    if verbose:
        n = sum(np.size(v) for v in jax_tree_leaves(params))
        print(f'loaded {path}: {n/1e6:.1f}M params')
    return params


def jax_tree_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)
