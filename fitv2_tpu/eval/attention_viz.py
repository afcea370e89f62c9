"""Attention visualization: capture, rollout, heatmap overlays.

Replaces /root/reference/fit/utils/attention_visualization.py:8-250 (which
reads maps the torch Attention modules stored under ``save_attention``).
Here maps are captured through flax's ``sow`` mechanism: build the model
with ``save_attention=True`` and apply with ``mutable=['intermediates']``;
``collect_attention_maps`` extracts the per-block (B, H, N, N) tensors.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def collect_attention_maps(intermediates: Dict) -> List[np.ndarray]:
    """Flatten the sown 'attn_probs' tensors in block order.

    Works for both the scanned block stack (one (depth, B, H, N, N) stacked
    leaf) and per-block module trees.
    """
    maps: List[np.ndarray] = []

    def visit(path, node):
        if isinstance(node, dict):
            for k in sorted(node):
                visit(path + (k,), node[k])
        else:  # tuple of sown values
            for v in node:
                arr = np.asarray(v)
                if arr.ndim == 5:  # scanned: (depth, B, H, N, N)
                    maps.extend(arr[i] for i in range(arr.shape[0]))
                else:
                    maps.append(arr)

    visit((), intermediates)
    return maps


def run_with_attention(model, params, *args, **kwargs):
    """(output, attention_maps) for a save_attention=True model."""
    out, mods = model.apply({'params': params}, *args,
                            mutable=['intermediates'], **kwargs)
    return out, collect_attention_maps(mods['intermediates'])


def attention_rollout(maps: List[np.ndarray], head_fusion: str = 'mean',
                      discard_ratio: float = 0.0) -> np.ndarray:
    """Recursive rollout A_l = norm(0.5 I + 0.5 fuse(A)) @ A_{l-1}
    (Abnar & Zuidema; matches the reference rollout semantics).

    maps: per-block (B, H, N, N). Returns (B, N, N).
    """
    result: Optional[np.ndarray] = None
    for attn in maps:
        if head_fusion == 'mean':
            fused = attn.mean(axis=1)
        elif head_fusion == 'max':
            fused = attn.max(axis=1)
        elif head_fusion == 'min':
            fused = attn.min(axis=1)
        else:
            raise ValueError(head_fusion)
        if discard_ratio > 0:
            b, n, _ = fused.shape
            flat = fused.reshape(b, -1)
            k = int(flat.shape[1] * discard_ratio)
            if k > 0:
                thresh = np.partition(flat, k, axis=1)[:, k:k + 1]
                flat = np.where(flat < thresh, 0.0, flat)
                fused = flat.reshape(b, n, n)
        eye = np.eye(fused.shape[-1], dtype=fused.dtype)[None]
        a = 0.5 * fused + 0.5 * eye
        a = a / a.sum(axis=-1, keepdims=True)
        result = a if result is None else a @ result
    assert result is not None, 'no attention maps'
    return result


def token_heatmap(rollout: np.ndarray, grid_hw: Tuple[int, int],
                  query_index: int = 0) -> np.ndarray:
    """One query row of the rollout reshaped to the (h, w) token grid."""
    h, w = grid_hw
    row = rollout[:, query_index, :h * w]
    row = row / (row.max(axis=-1, keepdims=True) + 1e-12)
    return row.reshape(-1, h, w)


def overlay_heatmap(image: np.ndarray, heatmap: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Blend a [0,1] heatmap (upsampled) onto a uint8 HWC image."""
    ih, iw = image.shape[:2]
    hm = jax.image.resize(jnp.asarray(heatmap, jnp.float32), (ih, iw),
                          method='bilinear')
    hm = np.asarray(hm)
    colored = np.zeros((ih, iw, 3), np.float32)
    colored[..., 0] = hm * 255.0  # red channel heat
    out = (1 - alpha) * image.astype(np.float32) + alpha * colored
    return np.clip(out, 0, 255).astype(np.uint8)
