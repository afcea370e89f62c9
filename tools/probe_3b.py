"""On-chip probe: the 3B tier — BASELINE configs[3] and its HR/BFM flanks.

Stages (run: python tools/probe_3b.py [serve|hr|bfm ...]; default: serve):

  serve  FiTv2-3B/2 256x256 250-step CFG sampling (reference
         configs/fitv2/config_fitv2_3B.yaml:27-46 — hidden 2304 / depth 40 /
         heads 24 / Dh 96; 653 fvcore-GFLOPs/NFE, README.md:55).
  hr     FiTv2-HR-3B/2 512x512, 1024 tokens, online decoupled NTK RoPE
         (reference configs/fitv2/config_fitv2_hr_3B.yaml; README.md:111) —
         the HBM stress point: 5.9 GB bf16 params + 1024-token activations.
  bfm    BFM-XL/2 segment sampling (reference configs/fitv2/
         config_bfm_XL.yaml:22-43 — hidden 1152 / depth 30 / K=6 perflow,
         20 representation blocks; fork plots 215.6 GFLOPs/NFE,
         plot_latency_throughput.py:11) at S=4 (24 NFE) and S=16 (96 NFE).

Roofline convention (PARITY.md round-2): published fvcore "GFLOPs" count
MACs; real FLOPs = 2x. One sampled image = 250 steps x 2 CFG forwards.
  3B/256:   real 1329 GFLOP/fwd -> 664 TFLOP/image -> bf16 ceiling
            (197 TFLOP/s) 0.297 img/s; int8 GEMM-only bound 0.593.
  3B/1024:  real 5605 GFLOP/fwd -> 2802 TFLOP/image -> bf16 ceiling 0.070.
(utils/misc.flop_count_forward, validated against the published XL 147G.)

Each stage ends with one BENCH-style JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the compile cache on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fitv2_tpu.sample import SamplingConfig, build_sampler  # noqa: E402

BATCH = 8


def build_3b(precision='bf16', context_size=256, online=False):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=context_size, patch_size=2, in_channels=4,
        hidden_size=2304, depth=40, num_heads=24, class_dropout_prob=0.1,
        num_classes=1000, learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=576,
        custom_freqs='ntk-aware' if online else 'normal',
        online_rope=online, decouple=online,
        ori_max_pe_len=16 if online else None,
        max_cached_len=64, dtype=jnp.bfloat16, gemm_precision=precision)


def _measure(tag, fn, args, batch, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]
    print(f'{tag}: compiled + warm', flush=True)
    times = []
    for rnd in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[0]
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f'round {rnd} {tag}: {dt*1000:.1f} ms '
              f'({batch/dt:.4f} img/s)', flush=True)
    best = min(times[1:]) if len(times) > 1 else times[0]
    print(f'{tag}: best-of-steady {best*1000:.1f} ms = '
          f'{batch/best:.4f} img/s', flush=True)
    return batch / best


def stage_serve():
    """3B/2 at 256px: bf16 dense, int8 dense, int8 + guidance window."""
    params = bench.init_params(build_3b())
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f'params: {n_params/1e9:.3f}B', flush=True)
    labels = (jnp.arange(BATCH) % 1000).astype(jnp.int32)
    rng = jax.random.PRNGKey(1)

    result = {'metric': 'FiTv2-3B 256x256 250-step ODE CFG sampling',
              'unit': 'images/sec/chip', 'params_b': round(n_params / 1e9, 3),
              'bf16_roofline': 0.297}
    for precision, name, kw, key in (
            ('bf16', 'dense', {}, 'value'),
            ('int8', 'dense', {}, 'int8_serving_value'),
            ('int8', 'win[.3,.9]',
             dict(guidance_low=0.3, guidance_high=0.9),
             'int8_interval_value'),
            ('int8', 'composed',
             dict(guidance_low=0.3, guidance_high=0.9,
                  velocity_eval_every=2, velocity_extrap_order=2),
             'int8_composed_value')):
        model = build_3b(precision)
        cfg = SamplingConfig(
            image_height=256, image_width=256,
            num_sampling_steps=bench.STEPS, cfg_scale=bench.CFG_SCALE,
            per_device_batch=BATCH, dtype=jnp.bfloat16, **kw)
        fn = build_sampler(model, params, cfg)
        result[key] = round(
            _measure(f'{precision}:{name}', fn, (rng, labels), BATCH), 4)
    result['mfu_bf16'] = round(result['value'] / result['bf16_roofline'], 3)
    print(json.dumps(result), flush=True)


def stage_hr():
    """HR-3B/2 at 512px (1024 tokens, online decoupled NTK), batch 2."""
    B = 2
    n_ctx, n_hw = 1024, 32
    b2 = 2 * B
    gw, gh = np.meshgrid(np.arange(n_hw), np.arange(n_hw))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, n_ctx)), jnp.int32)
    size = jnp.asarray(np.broadcast_to(np.array([[n_hw, n_hw]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([(jnp.arange(B) % 1000).astype(jnp.int32),
                         jnp.full((B,), 1000, jnp.int32)])
    sigmas = jnp.linspace(0.0, 1.0, 251)

    result = {'metric': 'FiTv2-HR-3B 512x512 250-step ODE CFG sampling',
              'unit': 'images/sec/chip', 'bf16_roofline': 0.070}
    params = None
    for precision, key in (('bf16', 'value'), ('int8', 'int8_serving_value')):
        model = build_3b(precision, context_size=n_ctx, online=True)
        if params is None:
            params = bench.init_params(model)
        extra = {}
        if precision == 'int8':
            from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                             prequantize_weights)
            zz = jax.random.normal(jax.random.PRNGKey(9), (b2, n_ctx, 16),
                                   jnp.float32)
            cal = [(zz * s, jnp.full((b2,), t, jnp.float32), y, grid, None,
                    size) for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))]
            extra = {'quant_calib': calibrate_quant_scales(model, params, cal),
                     'quant_weights': prequantize_weights(model, params,
                                                          cal[0])}
            print('calibrated + prequantized', flush=True)

        @jax.jit
        def sample(params, extra, z, model=model):
            def step(z, pair):
                t_cur, t_next = pair[0], pair[1]
                z2 = jnp.concatenate([z, z], axis=0)
                t2 = jnp.full((b2,), t_cur, jnp.float32)
                out = model.apply({'params': params, **extra}, z2, t2, y,
                                  grid, None, size)
                cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
                v = uncond + 1.65 * (cond - uncond)
                return z + (t_next - t_cur) * v, None
            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            z, _ = jax.lax.scan(step, z, pairs)
            return z

        z0 = jax.random.normal(jax.random.PRNGKey(1), (B, n_ctx, 16),
                               jnp.float32)
        print(f'compiling HR-3B {precision}...', flush=True)
        result[key] = round(
            _measure(f'hr3b:{precision}', sample, (params, extra, z0), B), 4)
    result['mfu_bf16'] = round(result['value'] / result['bf16_roofline'], 3)
    print(json.dumps(result), flush=True)


def stage_hr_composed():
    """HR-3B serving maximum through the real pipeline: int8 + interval
    [0.3,0.9] + velocity extrapolation N=2 order-2 at 512px/1024 tokens
    (interpolation='keep' preserves the model's online decoupled NTK —
    the tools/hr_probe.py stage_composed pattern at the 3B geometry)."""
    B = 2
    model = build_3b('int8', context_size=1024, online=True)
    params = bench.init_params(model)
    cfg = SamplingConfig(
        image_height=512, image_width=512, num_sampling_steps=250,
        cfg_scale=1.65, per_device_batch=B, dtype=jnp.bfloat16,
        interpolation='keep', guidance_low=0.3, guidance_high=0.9,
        velocity_eval_every=2, velocity_extrap_order=2)
    fn = build_sampler(model, params, cfg)
    labels = (jnp.arange(B) % 1000).astype(jnp.int32)
    print('compiling HR-3B composed (int8+win+extrap2-o2)...', flush=True)
    v = _measure('hr3b:composed', fn, (jax.random.PRNGKey(1), labels), B)
    print(json.dumps({
        'metric': 'FiTv2-HR-3B 512x512 composed serving max',
        'unit': 'images/sec/chip', 'int8_composed_value': round(v, 4),
        'bf16_roofline': 0.070}), flush=True)


def _build_bfm(precision='bf16'):
    from fitv2_tpu.models.bfm import BFM
    return BFM(context_size=256, hidden_size=1152, depth=30, num_heads=16,
               use_swiglu=False, q_norm='rmsnorm', k_norm='rmsnorm',
               adaln_type='normal', adaln_lora_dim=288,
               number_of_perflow=6, number_of_representation_blocks=20,
               repa_dim=768, n_patch_h=16, n_patch_w=16,
               class_dropout_prob=0.1, max_cached_len=64,
               dtype=jnp.bfloat16, gemm_precision=precision)


def stage_bfm():
    """BFM-XL/2 segment sampling (K=6) at S=4 (24 NFE) and S=16 (96 NFE),
    bf16 and int8 W8A8 serving."""
    model = _build_bfm()
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    grid, mask, size = make_grid_mask_size(1, 16, 16, 256)
    x0 = jnp.zeros((1, 256, 16), jnp.float32)
    y0 = jnp.zeros((1,), jnp.int32)
    print('init BFM-XL...', flush=True)
    params = jax.jit(lambda r: model.init(
        {'params': r, 'label_dropout': jax.random.PRNGKey(1)},
        x0, jnp.zeros((1,)), y0, grid, mask, size)
    )(jax.random.PRNGKey(0))['params']
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f'params: {n_params/1e9:.3f}B', flush=True)
    y = (jnp.arange(BATCH) % 1000).astype(jnp.int32)
    result = {'metric': 'BFM-XL segment CFG sampling (K=6)',
              'unit': 'images/sec/chip', 'params_b': round(n_params / 1e9, 3)}
    mq = _build_bfm('int8')
    from fitv2_tpu.ops.quant import calibrate_quant_scales, prequantize_weights
    grid2, mask2, size2 = make_grid_mask_size(2 * BATCH, 16, 16, 256)
    zc = jax.random.normal(jax.random.PRNGKey(9), (2 * BATCH, 256, 16))
    yc = jnp.concatenate([y, jnp.full((BATCH,), 1000, jnp.int32)])
    rngs = {'label_dropout': jax.random.PRNGKey(21)}
    cal = [(zc * s, jnp.full((2 * BATCH,), t, jnp.float32), yc, grid2,
            mask2, size2) for s, t in ((1.0, 0.1), (0.8, 0.5), (0.7, 0.9))]
    print('calibrating BFM-XL int8...', flush=True)
    coll = {'quant_calib': calibrate_quant_scales(mq, params, cal,
                                                  rngs=rngs),
            'quant_weights': prequantize_weights(mq, params, cal[0],
                                                 rngs=rngs)}
    for prec, m, variables, key in (
            ('bf16', model, {'params': params}, ''),
            ('int8', mq, {'params': params, **coll}, 'int8_')):
        for steps in (4, 16):
            # variables as a jit ARGUMENT: closing over the prequantized
            # weights embeds them as HLO constants and the remote compile
            # rejects the payload (HTTP 413)
            @jax.jit
            def sample(variables, z, m=m, steps=steps):
                return m.apply(variables, z, y, 1.4, steps,
                               method=m.sample_cfg)
            z0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 256, 16),
                                   jnp.float32)
            print(f'compiling BFM-XL {prec} sample_cfg S={steps}...',
                  flush=True)
            v = _measure(f'bfm_xl:{prec}:S{steps}', sample, (variables, z0),
                         BATCH)
            result[f'{key}s{steps}_value'] = round(v, 4)
            result[f'{key}s{steps}_nfe'] = 2 * steps  # CFG-doubled NFE
    print(json.dumps(result), flush=True)


if __name__ == '__main__':
    print('devices:', jax.devices(), flush=True)
    for s in sys.argv[1:] or ['serve']:
        {'serve': stage_serve, 'hr': stage_hr, 'bfm': stage_bfm,
         'hr_composed': stage_hr_composed}[s]()
    print('DONE', flush=True)
