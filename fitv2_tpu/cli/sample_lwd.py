"""CLI: LwD/BFM sampling (reference sample_fitv2_lwd_ddp.py / generate.py).

Usage:
    python -m fitv2_tpu.cli.sample_lwd --cfgdir configs/bfm.yaml \
        --ckpt runs/bfm/checkpoints/checkpoint-400000 \
        --sampler maruyama --cfg-scale 1.4 --steps-per-flow 42 \
        --num-fid-samples 50000 --out samples.npz
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='LwD/BFM TPU sampling')
    p.add_argument('--cfgdir', nargs='+', required=True)
    p.add_argument('--ckpt', required=True,
                   help='orbax checkpoint dir (TrainState with ema_params)')
    p.add_argument('--sampler', default='cfg',
                   choices=['plain', 'cfg', 'maruyama', 'maruyama_global',
                            'multiscale'])
    p.add_argument('--global-steps', type=int, default=250,
                   help='sigma-grid points for the maruyama_global sampler '
                        '(sharedenc models only)')
    p.add_argument('--self-guidance', action='store_true',
                   help='representation self-guidance (sharedenc models)')
    p.add_argument('--cfg-scale', type=float, default=1.4)
    p.add_argument('--steps-per-flow', type=int, default=1,
                   help='Euler sub-steps per segment '
                        '(reference number_of_step_perflow)')
    p.add_argument('--guidance-low', type=float, default=0.0)
    p.add_argument('--guidance-high', type=float, default=1.0)
    p.add_argument('--num-fid-samples', type=int, default=50_000)
    p.add_argument('--per-device-batch', type=int, default=32)
    p.add_argument('--global-seed', type=int, default=0)
    p.add_argument('--vae', default=None)
    p.add_argument('--out', default='samples_lwd.npz')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fitv2_tpu.ckpt.checkpoint import CheckpointManager
    from fitv2_tpu.sample import save_npz
    from fitv2_tpu.utils import config_to_model, load_config
    from fitv2_tpu.utils.config import _to_plain

    cfg = _to_plain(load_config(args.cfgdir))
    model = config_to_model(cfg['diffusion']['network_config'])

    # restore ema params from an orbax TrainState checkpoint
    import os
    ckpt_dir, step_name = os.path.split(args.ckpt.rstrip('/'))
    mgr = CheckpointManager(ckpt_dir)
    step = int(step_name.split('-')[-1])
    # template from a fresh init
    B = args.per_device_batch
    n_tok = model.n_patch_h * model.n_patch_w
    token_dim = model.patch_size ** 2 * model.in_channels
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    grid, mask, size = make_grid_mask_size(1, model.n_patch_h,
                                           model.n_patch_w, n_tok)
    params_t = model.init(
        {'params': jax.random.PRNGKey(0),
         'label_dropout': jax.random.PRNGKey(1)},
        jnp.zeros((1, n_tok, token_dim)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    from fitv2_tpu.train import OptimizerConfig, create_train_state, \
        make_optimizer
    template = create_train_state(params_t,
                                  make_optimizer(OptimizerConfig()))
    restored, _ = mgr.restore(
        jax.tree_util.tree_map(np.asarray, template), step=step)
    assert restored is not None, f'cannot restore {args.ckpt}'
    params = restored.ema_params

    method = {
        'plain': lambda p, r, z, y: model.apply(
            {'params': p}, z, y, args.steps_per_flow, method=model.sample),
        'cfg': lambda p, r, z, y: model.apply(
            {'params': p}, z, y, args.cfg_scale, args.steps_per_flow,
            method=model.sample_cfg),
        'maruyama': lambda p, r, z, y: model.apply(
            {'params': p}, r, z, y, args.cfg_scale, args.steps_per_flow,
            args.guidance_low, args.guidance_high,
            method=model.sample_maruyama_cfg),
        'maruyama_global': lambda p, r, z, y: model.apply(
            {'params': p}, r, z, y, args.cfg_scale, args.global_steps,
            args.guidance_low, args.guidance_high, args.self_guidance,
            method=model.sample_maruyama_global_cfg),
        'multiscale': lambda p, r, z, y: model.apply(
            {'params': p}, r, z, y, args.steps_per_flow,
            method=model.sample_multiscale),
    }[args.sampler]
    sample_jit = jax.jit(lambda p, r, z, y: method(p, r, z, y))

    vae = vae_params = None
    if args.vae:
        from fitv2_tpu.vae import AutoencoderKL, load_vae_params
        import jax.numpy as jnp
        # bf16 decoder convs (GroupNorm statistics stay fp32): measured
        # 30.4 vs 34.2 ms per batch-8 at 256px (profiler device time) —
        # the decoder is bandwidth-bound, and the output clips to uint8
        vae = AutoencoderKL(dtype=jnp.bfloat16)
        vae_params = load_vae_params(args.vae)
        decode = jax.jit(lambda lat: vae.apply(
            {'params': vae_params}, lat / 0.18215, method=vae.decode))

    start_tok = n_tok // 16 if args.sampler == 'multiscale' else n_tok
    out_imgs = []
    n_batches = int(np.ceil(args.num_fid_samples / B))
    base = jax.random.PRNGKey(args.global_seed)
    for bi in range(n_batches):
        key = jax.random.fold_in(base, bi)
        k_y, k_z, k_s = jax.random.split(key, 3)
        y = jax.random.randint(k_y, (B,), 0, model.num_classes)
        z = jax.random.normal(k_z, (B, start_tok, token_dim))
        lat_tokens = sample_jit(params, k_s, z, y)
        lat_hw = (model.n_patch_h * model.patch_size,
                  model.n_patch_w * model.patch_size)
        lat = model.unpatchify(lat_tokens, lat_hw, channel_last=True)
        if vae is None:
            out_imgs.append(np.asarray(lat))
        else:
            img = decode(lat)
            img = jnp.clip(img.astype(jnp.float32), -1, 1)
            img = jnp.clip(127.5 * img + 128.0, 0, 255).astype(jnp.uint8)
            out_imgs.append(np.asarray(img))
    images = np.concatenate(out_imgs)[:args.num_fid_samples]
    save_npz(args.out, images)
    print(f'Saved {args.out} [shape={images.shape}]')


if __name__ == '__main__':
    main()
