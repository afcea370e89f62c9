"""HR (1024-token) path roofline: where does 0.147 img/s go? (VERDICT #9)

Round-1 measured 0.147 img/s at 512px (1024 tokens, online decoupled-NTK
RoPE, Pallas flash attention) with no breakdown. Scaling from the 256-token
step: GEMM FLOPs x4, attention matmuls x16, softmax traffic x4 -> expected
~0.19-0.21 img/s at equal MFU. This probe separates the suspects:

  fwd-cached   full XL fwd, CACHED rope tables (upper bound, no online cost)
  fwd-online   full XL fwd, online decoupled NTK recompute per call
  attn         N=1024 attention: Pallas flash vs XLA chain (bf16 logits)
  sampler      end-to-end 250-step HR throughput (cached + online)

Run from /root/repo (never clobber PYTHONPATH): python tools/hr_probe.py
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:  # persistent compile cache — effective through the axon tunnel;
    # keyed per machine (SIGILL hazard for cross-host CPU AOT entries)
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CTX = 1024
N_H = N_W = 32  # 512px / 8 / 2
B = 2           # HR batch (memory-bound); b2 = 4 with CFG


def build_hr(online: bool, precision: str = 'bf16'):
    from fitv2_tpu.models.fit import FiT
    # config_fitv2_hr_xl.yaml: ntk-aware decoupled, ori_max_pe_len 16
    return FiT(
        context_size=N_CTX, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288,
        custom_freqs='ntk-aware' if online else 'normal',
        online_rope=online, decouple=online, ori_max_pe_len=16,
        max_cached_len=32, dtype=jnp.bfloat16,
        gemm_precision=precision)


def make_inputs(b2):
    gw, gh = np.meshgrid(np.arange(N_W), np.arange(N_H))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, N_CTX)), jnp.int32)
    mask = jnp.ones((b2, N_CTX), jnp.float32)
    size = jnp.asarray(np.broadcast_to(np.array([[N_H, N_W]]), (b2, 1, 2)),
                       jnp.int32)
    y = (jnp.arange(b2) % 1000).astype(jnp.int32)
    return grid, mask, size, y


def init_params(model, grid, mask, size, y):
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, N_CTX, 16), jnp.float32),
        jnp.zeros((1,)), y[:1], grid[:1], mask[:1], size[:1])['params']
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)


def occupancy(model, params, grid, mask, size, y, l1=6, l2=24):
    b2 = grid.shape[0]
    t = jnp.full((b2,), 0.5, jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b2, N_CTX, 16),
                           jnp.bfloat16)

    def make(length):
        @jax.jit
        def run(x):
            def body(x, _):
                o = model.apply({'params': params}, x, t, y, grid, mask,
                                size)
                return (x + 0.001 * o).astype(x.dtype), None
            x, _ = jax.lax.scan(body, x, None, length=length)
            return x
        return run

    f1, f2 = make(l1), make(l2)
    for f in (f1, f2):
        jax.block_until_ready(f(x0))
    t0 = time.perf_counter(); jax.block_until_ready(f1(x0))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(f2(x0))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (l2 - l1)


def stage_fwd():
    """Queued-dispatch timing (the scanned variant's remote compile breaks
    the tunnel pipe at N=1024; single-forward compiles are fine and the
    ~36 ms dispatch latency amortizes across a 10-deep queue)."""
    b2 = 2 * B
    grid, mask, size, y = make_inputs(b2)
    t = jnp.full((b2,), 0.5, jnp.float32)
    fns = {}
    for online in (False, True):
        model = build_hr(online)
        params = init_params(model, grid, mask, size, y)
        print(f'compiling fwd online={online}...', flush=True)
        f = jax.jit(lambda p, x, model=model: model.apply(
            {'params': p}, x, t, y, grid, None, size))
        x = jax.random.normal(jax.random.PRNGKey(1), (b2, N_CTX, 16),
                              jnp.bfloat16)
        jax.block_until_ready(f(params, x))
        fns[online] = (f, params)
    # run-order control for the round-2 "online (57 ms) faster than cached
    # (95 ms)" anomaly: interleave A/B twice after both are compiled+warm
    for rep in range(2):
        for online in ((False, True) if rep % 2 == 0 else (True, False)):
            f, params = fns[online]
            x = jax.random.normal(jax.random.PRNGKey(1), (b2, N_CTX, 16),
                                  jnp.bfloat16)
            out = f(params, x)
            jax.block_until_ready(out)
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                # serialize via data dependence (output feeds next input)
                out = f(params, (out * 0.1).astype(jnp.bfloat16))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / n
            flops = 4 * 0.294e12 * (b2 / 2)  # per fwd (GEMM-dominated est)
            print(f'HR fwd rep={rep} online={online}: {dt*1e3:8.2f} ms '
                  f'({flops/dt/1e12:5.1f} TFLOP/s GEMM-eff)', flush=True)


def stage_attn():
    from fitv2_tpu.ops.attention import _xla_masked_attention
    from fitv2_tpu.ops.flash_attention import flash_masked_attention
    b2, H, Dh = 2 * B, 16, 72
    q = jax.random.normal(jax.random.PRNGKey(0), (b2, N_CTX, H, Dh),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b2, N_CTX, H, Dh),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b2, N_CTX, H, Dh),
                          jnp.bfloat16)
    mask = jnp.ones((b2, N_CTX), jnp.float32)

    for name, f in (('xla  ', _xla_masked_attention),
                    ('flash', flash_masked_attention)):
        def make(length, f=f):
            @jax.jit
            def run(q):
                def body(q, _):
                    o = f(q, k, v, mask)
                    return (q + 0.001 * o).astype(q.dtype), None
                q, _ = jax.lax.scan(body, q, None, length=length)
                return q
            return run
        f1, f2 = make(12), make(48)
        for g in (f1, f2):
            jax.block_until_ready(g(q))
        t0 = time.perf_counter(); jax.block_until_ready(f1(q))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(f2(q))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / 36
        print(f'HR attn {name}: {dt*1e6:8.1f} us/call', flush=True)


def stage_sampler():
    b2 = 2 * B
    grid, mask, size, _ = make_inputs(b2)
    y = jnp.concatenate([(jnp.arange(B) % 1000).astype(jnp.int32),
                         jnp.full((B,), 1000, jnp.int32)])
    for precision in ('bf16', 'int8cal'):
        for online in (True,):
            model = build_hr(online,
                             'int8' if precision == 'int8cal' else precision)
            params = init_params(model, grid, mask, size, y)
            sigmas = jnp.linspace(0.0, 1.0, 251)
            extra = {}
            if precision == 'int8cal':
                # static scales + prequantized weights (bench.py serving mode)
                from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                                 prequantize_weights)
                zz = jax.random.normal(jax.random.PRNGKey(9),
                                       (b2, N_CTX, 16), jnp.float32)
                cal_batches = [
                    (zz * s, jnp.full((b2,), t, jnp.float32), y, grid, None,
                     size) for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))]
                extra = {
                    'quant_calib': calibrate_quant_scales(model, params,
                                                          cal_batches),
                    'quant_weights': prequantize_weights(model, params,
                                                         cal_batches[0]),
                }
                print('calibrated + prequantized', flush=True)

            @jax.jit
            def sample(params, extra, z):
                def step(z, pair):
                    t_cur, t_next = pair[0], pair[1]
                    z2 = jnp.concatenate([z, z], axis=0)
                    t2 = jnp.full((b2,), t_cur, jnp.float32)
                    out = model.apply({'params': params, **extra}, z2, t2, y,
                                      grid, None, size)
                    cond, uncond = jnp.split(out.astype(jnp.float32), 2,
                                             axis=0)
                    vv = uncond + 1.65 * (cond - uncond)
                    return z + (t_next - t_cur) * vv, None
                pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
                z, _ = jax.lax.scan(step, z, pairs)
                return z

            z0 = jax.random.normal(jax.random.PRNGKey(1), (B, N_CTX, 16),
                                   jnp.float32)
            print(f'compiling HR sampler {precision} online={online}...',
                  flush=True)
            sample(params, extra, z0).block_until_ready()
            t0 = time.perf_counter()
            out = sample(params, extra, z0)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            print(f'HR sampler {precision}: {dt:7.2f} s -> '
                  f'{B/dt:6.3f} img/s/chip', flush=True)


def stage_extrap():
    """HR sampler composed with velocity extrapolation (the serving-mode
    NFE reducer measured at 256px in tools/extrap_probe.py) — same 250-step
    ladder, model evals on every N-th rung."""
    from fitv2_tpu.flow.samplers import euler_sample_extrapolated
    b2 = 2 * B
    grid, mask, size, _ = make_inputs(b2)
    y = jnp.concatenate([(jnp.arange(B) % 1000).astype(jnp.int32),
                         jnp.full((B,), 1000, jnp.int32)])
    sigmas = jnp.linspace(0.0, 1.0, 251)
    for precision in ('bf16', 'int8cal'):
        model = build_hr(True,
                         'int8' if precision == 'int8cal' else precision)
        params = init_params(model, grid, mask, size, y)
        extra = {}
        if precision == 'int8cal':
            from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                             prequantize_weights)
            zz = jax.random.normal(jax.random.PRNGKey(9), (b2, N_CTX, 16),
                                   jnp.float32)
            cal_batches = [
                (zz * s, jnp.full((b2,), t, jnp.float32), y, grid, None,
                 size) for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))]
            extra = {
                'quant_calib': calibrate_quant_scales(model, params,
                                                      cal_batches),
                'quant_weights': prequantize_weights(model, params,
                                                     cal_batches[0]),
            }
            print('calibrated + prequantized', flush=True)

        outs = {}
        for ev in (1, 2, 4):
            @jax.jit
            def sample(params, extra, z, ev=ev):
                def drift(zc, t_vec):
                    z_in = jnp.concatenate([zc, zc], 0).astype(jnp.bfloat16)
                    t2 = jnp.concatenate([t_vec, t_vec]).astype(jnp.float32)
                    out = model.apply({'params': params, **extra}, z_in, t2,
                                      y, grid, None, size)
                    c, u = jnp.split(out.astype(jnp.float32), 2, axis=0)
                    return u + 1.65 * (c - u)
                return euler_sample_extrapolated(drift, z, sigmas,
                                                 eval_every=ev)

            z0 = jax.random.normal(jax.random.PRNGKey(1), (B, N_CTX, 16),
                                   jnp.float32)
            print(f'compiling HR extrap {precision} ev={ev}...', flush=True)
            sample(params, extra, z0).block_until_ready()
            t0 = time.perf_counter()
            out = sample(params, extra, z0)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            outs[ev] = np.asarray(out)
            print(f'HR extrap {precision} ev={ev}: {dt:7.2f} s -> '
                  f'{B/dt:6.3f} img/s/chip ({250//ev} evals)', flush=True)
        for ev in (2, 4):
            rel = (np.linalg.norm(outs[ev] - outs[1])
                   / np.linalg.norm(outs[1]))
            print(f'HR latents relL2 ev={ev} vs dense: {rel:.4f}',
                  flush=True)


def stage_composed():
    """HR serving maximum: int8 GEMMs + guidance-interval CFG [0.3, 0.9] +
    velocity extrapolation N=2 order-2 through the real sampling pipeline
    (the same composed build_sampler config bench.py's serving_max reports
    at 256px)."""
    from fitv2_tpu.sample import SamplingConfig, build_sampler
    model = build_hr(True, 'int8')
    grid, mask, size, y = make_inputs(2 * B)
    params = init_params(model, grid, mask, size, y)
    # interpolation='keep' preserves the model's online decoupled NTK RoPE
    # (config_fitv2_hr_xl.yaml); the round-3 run used the default 'no',
    # which cloned the model back to cached-normal RoPE and measured a
    # different (cheaper) graph than stage_sampler/stage_extrap.
    cfg = SamplingConfig(
        image_height=512, image_width=512, num_sampling_steps=250,
        cfg_scale=1.65, per_device_batch=B, dtype=jnp.bfloat16,
        interpolation='keep',
        guidance_low=0.3, guidance_high=0.9,
        velocity_eval_every=2, velocity_extrap_order=2)
    fn = build_sampler(model, params, cfg)
    labels = (jnp.arange(B) % 1000).astype(jnp.int32)
    rng = jax.random.PRNGKey(1)
    print('compiling HR composed (int8+win+extrap2-o2)...', flush=True)
    out = fn(rng, labels)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]
    times = []
    for rnd in range(3):
        t0 = time.perf_counter()
        out = fn(rng, labels)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[0]
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f'round {rnd}: {dt*1000:.0f} ms ({B/dt:.4f} img/s)',
              flush=True)
    best = min(times[1:]) if len(times) > 1 else times[0]
    print(f'HR composed best-of-steady: {B/best:.4f} img/s/chip',
          flush=True)


if __name__ == '__main__':
    print('backend:', jax.devices(), flush=True)
    for s in sys.argv[1:] or ['fwd', 'attn', 'sampler']:
        {'fwd': stage_fwd, 'attn': stage_attn,
         'sampler': stage_sampler, 'extrap': stage_extrap,
         'composed': stage_composed}[s]()
    print('DONE', flush=True)
