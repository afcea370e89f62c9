"""Export fitv2_tpu FiT params back to reference-named state dicts.

Inverse of fitv2_tpu/ckpt/torch_import.py: flax param trees (scan-stacked or
per-block) -> the reference's PyTorch key naming
(/root/reference/fit/model/fit_model.py state_dict layout), so models
trained here can be loaded by the reference code or published in the same
format. Undoes the split-RoPE basis permutation when the model was built
with rope_layout='split'.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = '') -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unsplit_permute(flat: Dict[str, np.ndarray], num_heads: int) -> None:
    """Invert the split-basis permutation on q/k columns (in place)."""
    from fitv2_tpu.models.rope import split_permutation

    for kk in [k for k in flat if k.endswith('attn/qkv/kernel')]:
        w = flat[kk]
        d = w.shape[-1] // 3
        dh = d // num_heads
        perm = split_permutation(dh)
        inv = np.argsort(perm)

        def unpermute(block):
            b = block.reshape(block.shape[:-1] + (num_heads, dh))
            return b[..., inv].reshape(block.shape)

        q, k_, v = np.split(w, 3, axis=-1)
        flat[kk] = np.concatenate([unpermute(q), unpermute(k_), v], axis=-1)
        bk = kk[:-len('kernel')] + 'bias'
        if bk in flat:
            qb, kb, vb = np.split(flat[bk], 3, axis=-1)
            def unpermute_b(x):
                return x.reshape(x.shape[:-1] + (num_heads, dh))[
                    ..., inv].reshape(x.shape)
            flat[bk] = np.concatenate(
                [unpermute_b(qb), unpermute_b(kb), vb], axis=-1)
        base = kk[:-len('qkv/kernel')]
        for nk in (base + 'q_norm/weight', base + 'k_norm/weight'):
            if nk in flat:
                flat[nk] = flat[nk][..., inv]


def _adaln_names(fprefix: str, adaln_type: str) -> List[tuple]:
    if adaln_type == 'lora':
        return [(f'{fprefix}/fc1', '.1'), (f'{fprefix}/fc_out', '.2')]
    if adaln_type == 'swiglu':
        return [(f'{fprefix}/{n}', f'.{n}')
                for n in ('fc1_g', 'fc1_x', 'fc2')]
    return [(f'{fprefix}/fc_out', '.1')]


def export_fit_state_dict(params: Dict[str, Any], *, depth: int,
                          adaln_type: str = 'normal',
                          scan_blocks: bool = True,
                          num_heads: Optional[int] = None,
                          rope_layout: str = 'split'
                          ) -> Dict[str, np.ndarray]:
    """flax params -> reference-named flat dict (torch layouts, fp32)."""
    flat = _flatten(params)
    if rope_layout == 'split':
        assert num_heads is not None
        _unsplit_permute(flat, num_heads)

    sd: Dict[str, np.ndarray] = {}

    def put_linear(fpath: str, tname: str, i: Optional[int] = None):
        kkey = f'{fpath}/kernel'
        if kkey not in flat:
            return
        w = flat[kkey]
        b = flat.get(f'{fpath}/bias')
        if i is not None:
            w = w[i]
            b = b[i] if b is not None else None
        sd[tname + '.weight'] = np.ascontiguousarray(
            np.swapaxes(w, -1, -2)).astype(np.float32)
        if b is not None:
            sd[tname + '.bias'] = b.astype(np.float32)

    def put_norm(fpath: str, tname: str, i: Optional[int] = None):
        wkey = f'{fpath}/weight'
        if wkey not in flat:
            return
        w = flat[wkey]
        sd[tname + '.weight'] = (w[i] if i is not None else w).astype(
            np.float32)

    put_linear('x_embedder/proj', 'x_embedder.proj')
    put_linear('t_embedder/mlp_0', 't_embedder.mlp.0')
    put_linear('t_embedder/mlp_2', 't_embedder.mlp.2')
    if 'y_embedder/embedding_table' in flat:
        sd['y_embedder.embedding_table.weight'] = flat[
            'y_embedder/embedding_table'].astype(np.float32)
    for fpath, suffix in _adaln_names('global_adaLN_modulation', 'normal'):
        put_linear(fpath, 'global_adaLN_modulation' + suffix)

    for i in range(depth):
        pre = ('blocks/block', i) if scan_blocks else (f'blocks_{i}', None)
        fbase, idx = pre
        t = f'blocks.{i}'
        put_linear(f'{fbase}/attn/qkv', f'{t}.attn.qkv', idx)
        put_linear(f'{fbase}/attn/proj', f'{t}.attn.proj', idx)
        put_norm(f'{fbase}/attn/q_norm', f'{t}.attn.q_norm', idx)
        put_norm(f'{fbase}/attn/k_norm', f'{t}.attn.k_norm', idx)
        # fused SwiGLU fc1 ([g | x] columns, models/modules.py) splits back
        # into the timm fc1_g/fc1_x keys; a plain-Mlp fc1 (out == fc2's in)
        # exports as-is (FiTv1).
        fc1 = flat.get(f'{fbase}/mlp/fc1/kernel')
        fc2 = flat.get(f'{fbase}/mlp/fc2/kernel')
        if fc1 is not None and fc2 is not None \
                and fc1.shape[-1] == 2 * fc2.shape[-2]:
            w = fc1[idx] if idx is not None else fc1
            b = flat.get(f'{fbase}/mlp/fc1/bias')
            if b is not None and idx is not None:
                b = b[idx]
            wg, wx = np.split(w, 2, axis=-1)
            sd[f'{t}.mlp.fc1_g.weight'] = np.ascontiguousarray(
                wg.T).astype(np.float32)
            sd[f'{t}.mlp.fc1_x.weight'] = np.ascontiguousarray(
                wx.T).astype(np.float32)
            if b is not None:
                bg, bx = np.split(b, 2, axis=-1)
                sd[f'{t}.mlp.fc1_g.bias'] = bg.astype(np.float32)
                sd[f'{t}.mlp.fc1_x.bias'] = bx.astype(np.float32)
            put_linear(f'{fbase}/mlp/fc2', f'{t}.mlp.fc2', idx)
        else:
            for n in ('fc2', 'fc1'):
                put_linear(f'{fbase}/mlp/{n}', f'{t}.mlp.{n}', idx)
        for fpath, suffix in _adaln_names(f'{fbase}/adaLN_modulation',
                                          adaln_type):
            put_linear(fpath, f'{t}.adaLN_modulation' + suffix, idx)

    put_linear('final_layer/linear', 'final_layer.linear')
    fl_type = 'swiglu' if adaln_type == 'swiglu' else 'normal'
    for fpath, suffix in _adaln_names('final_layer/adaLN_modulation',
                                      fl_type):
        put_linear(fpath, 'final_layer.adaLN_modulation' + suffix)
    put_norm('final_layer/norm_final', 'final_layer.norm_final')
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
