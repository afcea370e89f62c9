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
  blocks.N.mlp.{fc1_g+fc1_x->fc1,fc2,fc1}.* .../mlp/* (SwiGLU fc1 fused [g|x])
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


def _split_layout_permute(flat: Dict[str, np.ndarray],
                          num_heads: int) -> None:
    """Permute q/k bases for the TPU-fast split RoPE layout (in place).

    With rope_layout='split' the model rotates contiguous halves instead of
    interleaved pairs (fitv2_tpu/models/rope.py rotate_half_split). Attention
    dot products are invariant when q AND k live in the permuted basis, so
    folding the permutation into the qkv projection columns (and q/k norm
    weights) at import time makes outputs bit-compatible with the reference
    at zero runtime cost.
    """
    from fitv2_tpu.models.rope import split_permutation

    qkv_keys = [k for k in flat if k.endswith('attn/qkv/kernel')]
    for kk in qkv_keys:
        w = flat[kk]  # (in, 3*D) flax layout
        d_in, d3 = w.shape[-2], w.shape[-1]
        d = d3 // 3
        dh = d // num_heads
        perm = split_permutation(dh)

        def permute_block(block):  # (..., in, D) -> per-head dh permute
            b = block.reshape(block.shape[:-1] + (num_heads, dh))
            return b[..., perm].reshape(block.shape)

        q, k_, v = np.split(w, 3, axis=-1)
        flat[kk] = np.concatenate(
            [permute_block(q), permute_block(k_), v], axis=-1)
        bk = kk[:-len('kernel')] + 'bias'
        if bk in flat:
            b = flat[bk]
            qb, kb, vb = np.split(b, 3, axis=-1)
            def permute_bias(x):
                return x.reshape(x.shape[:-1] + (num_heads, dh))[
                    ..., perm].reshape(x.shape)
            flat[bk] = np.concatenate(
                [permute_bias(qb), permute_bias(kb), vb], axis=-1)
        # per-head-dim q/k norm weights (w_layernorm/rmsnorm) share the basis
        base = kk[:-len('qkv/kernel')]
        for nk in (base + 'q_norm/weight', base + 'k_norm/weight'):
            if nk in flat:
                flat[nk] = flat[nk][..., perm]


def convert_fit_state_dict(
    sd: Dict[str, np.ndarray],
    *,
    depth: int,
    adaln_type: str = 'normal',
    scan_blocks: bool = True,
    ignore_keys: Optional[List[str]] = None,
    strict: bool = True,
    num_heads: Optional[int] = None,
    rope_layout: str = 'interleaved',
) -> Dict[str, Any]:
    """Map a reference FiT state dict to this package's flax params tree.

    rope_layout='split' (pass num_heads) permutes q/k for the TPU-fast
    rotation basis — required when loading into a model built with the
    default rope_layout='split'.
    """
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
        # SwiGLU checkpoints carry timm fc1_g/fc1_x; the flax SwiGLU runs
        # them as one fused (D, 2H) GEMM with [g | x] column layout
        # (models/modules.py SwiGLU) — concatenate here. Plain-Mlp (FiTv1)
        # checkpoints carry fc1 directly.
        wg = sd.pop(f'{pre}.mlp.fc1_g.weight', None)
        if wg is not None:
            wx = sd.pop(f'{pre}.mlp.fc1_x.weight')
            bf['mlp/fc1/kernel'] = np.ascontiguousarray(
                np.concatenate([wg.T, wx.T], axis=-1))
            bg = sd.pop(f'{pre}.mlp.fc1_g.bias', None)
            if bg is not None:
                bf['mlp/fc1/bias'] = np.concatenate(
                    [bg, sd.pop(f'{pre}.mlp.fc1_x.bias')])
        else:
            _map_linear(bf, f'{pre}.mlp.fc1', 'mlp/fc1', sd)
        _map_linear(bf, f'{pre}.mlp.fc2', 'mlp/fc2', sd)
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

    if rope_layout == 'split':
        assert num_heads is not None, (
            "rope_layout='split' conversion needs num_heads")
        _split_layout_permute(flat, num_heads)
    return _nest(flat)


def init_from_ckpt(path: str, *, depth: int, adaln_type: str = 'normal',
                   scan_blocks: bool = True,
                   ignore_keys: Optional[List[str]] = None,
                   num_heads: Optional[int] = None,
                   rope_layout: str = 'interleaved',
                   verbose: bool = True) -> Dict[str, Any]:
    """Reference-API-shaped loader: path -> flax params."""
    sd = load_torch_state_dict(path)
    params = convert_fit_state_dict(
        sd, depth=depth, adaln_type=adaln_type, scan_blocks=scan_blocks,
        ignore_keys=ignore_keys, num_heads=num_heads,
        rope_layout=rope_layout)
    if verbose:
        n = sum(np.size(v) for v in jax_tree_leaves(params))
        print(f'loaded {path}: {n/1e6:.1f}M params')
    return params


def jax_tree_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)
