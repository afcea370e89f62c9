"""CLI: FiTv2 FID sampling (reference sample_fitv2_ddp.py parity).

Usage:
    python -m fitv2_tpu.cli.sample --cfgdir configs/fitv2_xl.yaml \
        --ckpt FiTv2_XL/model_ema.safetensors \
        --image-height 256 --image-width 256 --cfg-scale 1.5 \
        --num-sampling-steps 250 --num-fid-samples 50000 \
        [--interpolation dynntk --ori-max-pe-len 16 --decouple] \
        [--vae path/to/sd-vae.safetensors] --out samples.npz
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='FiTv2 TPU FID sampling')
    p.add_argument('--cfgdir', nargs='+', required=True)
    p.add_argument('--ckpt', required=True)
    p.add_argument('--image-height', type=int, default=256)
    p.add_argument('--image-width', type=int, default=256)
    p.add_argument('--cfg-scale', type=float, default=1.5)
    p.add_argument('--num-sampling-steps', type=int, default=250)
    p.add_argument('--num-fid-samples', type=int, default=50_000)
    p.add_argument('--per-device-batch', type=int, default=32)
    p.add_argument('--num-classes', type=int, default=1000)
    p.add_argument('--global-seed', type=int, default=0)
    # RoPE interpolation (reference sample_fitv2_ddp.py:75-99)
    p.add_argument('--interpolation', default='no',
                   choices=['no', 'linear', 'dynntk', 'ntkpro1', 'ntkpro2',
                            'partntk', 'yarn'])
    p.add_argument('--decouple', action='store_true')
    p.add_argument('--ori-max-pe-len', type=int, default=None)
    p.add_argument('--vae', default=None,
                   help='sd-vae safetensors/bin; omit to emit raw latents')
    p.add_argument('--out', default='samples.npz')
    p.add_argument('--resume-dir', default=None,
                   help='directory for per-batch shards; a restarted run '
                        'skips completed batches (preemption-safe FID '
                        'generation, bit-identical to an uninterrupted run)')
    p.add_argument('--data-parallel', action='store_true',
                   help='shard the CFG batch over all local devices '
                        '(single-process DP FID generation; the DDP '
                        'counterpart of reference sample_fitv2_ddp.py)')
    p.add_argument('--gemm-precision', default=None,
                   choices=['bf16', 'int8'],
                   help="override network gemm_precision; 'int8' runs the "
                        'block GEMMs on the double-rate W8A8 MXU path '
                        '(ops/quant.py) — a serving speed mode')
    p.add_argument('--velocity-eval-every', type=int, default=1,
                   help='training-free NFE reduction: run the model only '
                        'on every N-th ladder step, linear velocity '
                        'extrapolation in between '
                        '(flow/samplers.euler_sample_extrapolated); '
                        '1 = exact dense Euler (parity path)')
    p.add_argument('--velocity-extrap-order', type=int, default=1,
                   choices=(1, 2),
                   help='extrapolation order between evals: 1 linear, '
                        '2 Newton quadratic over the last three eval '
                        'velocities (same model cost)')
    p.add_argument('--guidance-low', type=float, default=0.0,
                   help='CFG interval lower bound: steps with t_cur outside '
                        '[guidance-low, guidance-high] run a single '
                        'conditional forward (half cost; reference LwD '
                        'window semantics, fit_model_lwd_bk.py:1332)')
    p.add_argument('--guidance-high', type=float, default=1.0,
                   help='CFG interval upper bound (see --guidance-low)')
    p.add_argument('--sampler-mode', default='ode',
                   choices=['ode', 'ddpm', 'ddim'],
                   help="'ode' = flow-matching Euler (FiTv2, reference "
                        "sample_fitv2_ddp.py); 'ddpm'/'ddim' = FiTv1 "
                        'improved-diffusion loops (reference '
                        'sample_fit_ddp.py) — num-sampling-steps becomes '
                        'the timestep respacing')
    return p.parse_args(argv)


_DIFFUSION_KEYS = ('noise_schedule', 'diffusion_steps', 'learn_sigma',
                   'sigma_small', 'predict_xstart', 'use_kl',
                   'rescale_learned_sigmas')


def _diffusion_config(diff_cfg: dict) -> dict:
    """create_diffusion kwargs from a config's ``diffusion`` section:
    the reference-style ``improved_diffusion:`` subsection
    (sample_fit_ddp.py:104-105) or flat keys (configs/fit_xl.yaml)."""
    out = {k: v for k, v in diff_cfg.get('improved_diffusion', {}).items()
           if k != 'timestep_respacing'}
    for k in _DIFFUSION_KEYS:
        if k in diff_cfg and k not in out:
            out[k] = diff_cfg[k]
    return out


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    from fitv2_tpu.ckpt import init_from_ckpt
    from fitv2_tpu.sample import (
        SamplingConfig, build_sampler, generate_fid_samples, save_npz)
    from fitv2_tpu.utils import config_to_model, load_config

    from fitv2_tpu.utils.config import _to_plain
    cfg = _to_plain(load_config(args.cfgdir))
    net = cfg['diffusion']['network_config']
    if args.gemm_precision:
        net.setdefault('params', {})['gemm_precision'] = args.gemm_precision
    model = config_to_model(net)
    params = init_from_ckpt(
        args.ckpt, depth=model.depth,
        adaln_type=model.adaln_type, scan_blocks=model.scan_blocks,
        num_heads=model.num_heads, rope_layout=model.rope_layout)

    vae = vae_params = None
    if args.vae:
        from fitv2_tpu.vae import AutoencoderKL, load_vae_params
        import jax.numpy as jnp
        # bf16 decoder convs (GroupNorm statistics stay fp32): measured
        # 30.4 vs 34.2 ms per batch-8 at 256px (profiler device time) —
        # the decoder is bandwidth-bound, and the output clips to uint8
        vae = AutoencoderKL(dtype=jnp.bfloat16)
        vae_params = load_vae_params(args.vae)

    scfg = SamplingConfig(
        image_height=args.image_height, image_width=args.image_width,
        num_sampling_steps=args.num_sampling_steps,
        cfg_scale=args.cfg_scale, num_classes=args.num_classes,
        per_device_batch=args.per_device_batch,
        interpolation=args.interpolation, decouple=args.decouple,
        ori_max_pe_len=args.ori_max_pe_len,
        data_parallel=args.data_parallel,
        velocity_eval_every=args.velocity_eval_every,
        velocity_extrap_order=args.velocity_extrap_order,
        guidance_low=args.guidance_low, guidance_high=args.guidance_high,
        sampler_mode=args.sampler_mode,
        diffusion_config=(_diffusion_config(cfg['diffusion'])
                          if args.sampler_mode != 'ode' else None))
    fn = build_sampler(model, params, scfg, vae, vae_params)
    images = generate_fid_samples(
        fn, args.num_fid_samples,
        getattr(fn, 'batch_size', args.per_device_batch),
        args.num_classes, seed=args.global_seed, progress=True,
        resume_dir=args.resume_dir)

    import jax
    if jax.process_count() > 1:
        from fitv2_tpu.parallel import process_allgather, sync_global_devices
        sync_global_devices('samples')
        images = np.concatenate(process_allgather(images), axis=0)
    if jax.process_index() == 0:
        save_npz(args.out, images, args.num_fid_samples)
        print(f'Saved {args.out} [shape={images.shape}]')


if __name__ == '__main__':
    main()
