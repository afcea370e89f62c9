"""Attention-map visualization for a FiT model.

Working replacement for /root/reference/examples/visualize_attention.py
(which imports nonexistent helpers — get_grid/create_masks, see SURVEY.md
§4): builds a FiT with save_attention=True, runs one denoise step, computes
the attention rollout, and writes per-query heatmap overlays as PNGs.

Usage:
    python examples/visualize_attention.py --out /tmp/attn \
        [--ckpt model_ema.safetensors --cfgdir configs/fitv2_xl.yaml]
Without a checkpoint a small randomly-initialized model is used (pattern
inspection of the rollout pipeline, not of a trained model).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='/tmp/fit_attention')
    p.add_argument('--ckpt', default=None)
    p.add_argument('--cfgdir', nargs='+', default=None)
    p.add_argument('--query', type=int, default=0,
                   help='query token index for the heatmap')
    p.add_argument('--t', type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fitv2_tpu.eval.attention_viz import (
        attention_rollout, overlay_heatmap, run_with_attention,
        token_heatmap)
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size

    if args.cfgdir:
        from fitv2_tpu.ckpt import init_from_ckpt
        from fitv2_tpu.utils import config_to_model, load_config
        from fitv2_tpu.utils.config import _to_plain
        cfg = _to_plain(load_config(args.cfgdir))
        model = config_to_model(cfg['diffusion']['network_config'],
                                save_attention=True, scan_blocks=False)
        params = init_from_ckpt(args.ckpt, depth=model.depth,
                                adaln_type=model.adaln_type,
                                scan_blocks=False,
                                num_heads=model.num_heads,
                                rope_layout=model.rope_layout)
    else:
        model = FiT(context_size=64, patch_size=2, in_channels=4,
                    hidden_size=128, depth=4, num_heads=4, num_classes=10,
                    learn_sigma=False, use_sit=True, use_swiglu=True,
                    max_cached_len=16, save_attention=True,
                    scan_blocks=False)
        params = None

    n_h = n_w = int(np.sqrt(model.context_size))
    grid, mask, size = make_grid_mask_size(1, n_h, n_w, model.context_size)
    token_dim = model.patch_size ** 2 * model.in_channels
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, model.context_size, token_dim))
    t = jnp.full((1,), args.t)
    y = jnp.zeros((1,), jnp.int32)
    if params is None:
        params = model.init(jax.random.PRNGKey(1), x, t, y, grid, mask,
                            size)['params']

    _, maps = run_with_attention(model, params, x, t, y, grid, mask, size)
    print(f'captured {len(maps)} block attention maps, '
          f'shape {maps[0].shape}')
    roll = attention_rollout(maps)
    hm = token_heatmap(roll, (n_h, n_w), query_index=args.query)

    os.makedirs(args.out, exist_ok=True)
    base = np.full((n_h * 16, n_w * 16, 3), 64, np.uint8)
    over = overlay_heatmap(base, hm[0])
    try:
        from PIL import Image
        Image.fromarray(over).save(osp := os.path.join(
            args.out, f'rollout_q{args.query}.png'))
        print('wrote', osp)
    except ImportError:
        np.save(os.path.join(args.out, f'rollout_q{args.query}.npy'), over)
        print('PIL unavailable; wrote npy instead')


if __name__ == '__main__':
    main()
