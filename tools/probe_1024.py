"""On-chip probe: 1024x1024 sampling (64x64 grid = 4096 tokens) — beyond
the reference's 512x512 HR ceiling.

At N=4096 the XLA attention chain's materialized bf16 logits are
(2, 16, 4096, 4096) = 1.07 GB per block — ~4.3 GB of softmax-chain traffic
per block, 36 blocks — while the flash kernel streams KV blocks and never
materializes them. This is the regime the Pallas kernel exists for
(ops/attention.py dispatch history); this probe measures both.

Stage 1: forward-only A/B (scan of 8 forwards, interleaved, first timing
discarded) at b2=2, XL geometry, online decoupled NTK rope (ori 16 -> 64).
Stage 2: full 250-step CFG sampler at batch 1 for the winner -> img/s.

Usage (real TPU): python tools/probe_1024.py [fwd|full]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the compile cache on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_H = N_W = 64
N_CTX = N_H * N_W
BATCH = 1


def build_hr_model(attn_impl, precision='bf16'):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=N_CTX, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288, custom_freqs='ntk-aware', decouple=True,
        ori_max_pe_len=16, max_pe_len_h=N_H, max_pe_len_w=N_W,
        online_rope=True, max_cached_len=N_H,
        dtype=jnp.bfloat16, attn_impl=attn_impl, gemm_precision=precision)


def make_inputs(b2):
    gw, gh = np.meshgrid(np.arange(N_W), np.arange(N_H))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, N_CTX)), jnp.int32)
    size = jnp.asarray(np.broadcast_to(np.array([[N_H, N_W]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([
        (jnp.arange(b2 // 2) % 1000).astype(jnp.int32),
        jnp.full((b2 // 2,), 1000, jnp.int32)])
    return grid, size, y


def stage_fwd():
    b2 = 2 * BATCH
    grid, size, y = make_inputs(b2)
    params = bench.init_params(build_hr_model('auto'))
    z = jax.random.normal(jax.random.PRNGKey(0), (b2, N_CTX, 16),
                          jnp.float32).astype(jnp.bfloat16)
    t = jnp.full((b2,), 0.5, jnp.float32)

    fns = {}
    for impl in ('auto', 'pallas'):
        model = build_hr_model(impl)

        @jax.jit
        def run8(params, z, model=model):
            def body(zc, _):
                out = model.apply({'params': params}, zc, t, y, grid,
                                  None, size)
                return out.astype(jnp.bfloat16), None
            zo, _ = jax.lax.scan(body, z, None, length=8)
            return zo
        out = run8(params, z)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[0]
        print(f'{impl}: compiled + warm', flush=True)
        fns[impl] = run8

    times = {k: [] for k in fns}
    for rnd in range(3):
        for impl, fn in fns.items():
            t0 = time.perf_counter()
            out = fn(params, z)
            jax.block_until_ready(out)
            _ = np.asarray(out).ravel()[0]
            dt = time.perf_counter() - t0
            times[impl].append(dt)
            print(f'round {rnd} {impl}: {dt/8*1000:.1f} ms/fwd', flush=True)
    for impl in fns:
        best = min(times[impl][1:]) / 8
        print(f'{impl}: best-of-steady {best*1000:.1f} ms/fwd', flush=True)

    # numerics: flash vs XLA on the same input
    m_x, m_p = build_hr_model('auto'), build_hr_model('pallas')
    ox = np.asarray(jax.jit(lambda p, z: m_x.apply(
        {'params': p}, z, t, y, grid, None, size))(params, z), np.float64)
    op = np.asarray(jax.jit(lambda p, z: m_p.apply(
        {'params': p}, z, t, y, grid, None, size))(params, z), np.float64)
    rel = np.linalg.norm(op - ox) / (np.linalg.norm(ox) + 1e-12)
    print(f'pallas-vs-xla forward relL2={rel:.3e}', flush=True)


def stage_full(impl='pallas', precision='bf16'):
    from fitv2_tpu.sample import SamplingConfig, build_sampler
    model = build_hr_model(impl, precision)
    params = bench.init_params(build_hr_model('auto'))
    cfg = SamplingConfig(
        image_height=1024, image_width=1024, num_sampling_steps=250,
        cfg_scale=1.65, per_device_batch=BATCH, dtype=jnp.bfloat16,
        interpolation='dynntk', decouple=True, ori_max_pe_len=16)
    fn = build_sampler(model, params, cfg)
    labels = jnp.arange(BATCH, dtype=jnp.int32)
    rng = jax.random.PRNGKey(1)
    out = fn(rng, labels)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]
    print(f'{impl}/{precision}: compiled + warm', flush=True)
    ts = []
    for rnd in range(3):
        t0 = time.perf_counter()
        out = fn(rng, labels)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[0]
        dt = time.perf_counter() - t0
        ts.append(dt)
        print(f'round {rnd}: {dt:.2f} s ({BATCH/dt:.4f} img/s)', flush=True)
    best = min(ts[1:])
    print(f'1024x1024 {impl}/{precision}: {best:.2f} s/batch-{BATCH} = '
          f'{BATCH/best:.4f} img/s', flush=True)


if __name__ == '__main__':
    mode = sys.argv[1] if len(sys.argv) > 1 else 'fwd'
    if mode == 'fwd':
        stage_fwd()
    else:
        stage_full(*(sys.argv[2:] or ['pallas']))
