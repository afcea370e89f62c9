"""Benchmark: FiTv2-XL/2 256x256 250-step ODE CFG sampling, images/sec/chip.

The north-star workload (BASELINE.json): the reference samples FiTv2-XL at
256x256 with a 250-step Euler flow ODE and CFG double-batching
(/root/reference/sample_fitv2_ddp.py:248-314). Here the whole denoise loop is
one jitted lax.scan on a single TPU chip, model in bfloat16.

vs_baseline: the reference publishes quality/GFLOPs but no throughput
(BASELINE.md). We normalize against an estimated reference single-A100
throughput for the same workload: 147 GFLOPs/NFE (README.md:54) x 2 (CFG)
x 250 steps = 73.5 TFLOPs/image; A100 bf16 312 TFLOPs peak at a generous
40% MFU -> ~1.70 images/sec. vs_baseline = measured / 1.70.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

def _enable_compile_cache():
    """Persistent XLA compile cache (verified effective through the axon
    remote-compile tunnel: cross-process recompiles drop to ~0). Keyed per
    machine so CPU AOT entries never cross hosts (SIGILL hazard)."""
    import os
    import sys
    root = os.path.dirname(os.path.abspath(__file__))
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        from fitv2_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(root)
    except Exception:
        pass

_enable_compile_cache()
import jax.numpy as jnp
import numpy as np

BATCH = 8          # images per measured scan
STEPS = 250        # ODE steps (NFE)
CFG_SCALE = 1.5
BASELINE_IMG_PER_SEC = 1.70  # estimated reference A100 (see module docstring)


def _timed(run, n_iters: int = 5, batch: int = None) -> dict:
    """Sustained throughput stats from n individually-timed calls (caller
    must have warmed `run` up). The tunnel runtime occasionally stalls one
    call for tens of seconds (observed 2026-08-19: a single stall turned
    the 1.02 img/s bf16 headline into 0.025 under mean-of-3 timing), so the
    headline `value` is the MEDIAN of n — robust to a stall outlier without
    the best-of peak bias the round-4 advisor flagged (the A100 baseline it
    is ratioed against is a mean estimate). min/mean ride along in the JSON
    so peak and stall-inclusive numbers stay visible."""
    batch = BATCH if batch is None else batch
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    times.sort()
    median = times[n_iters // 2] if n_iters % 2 else 0.5 * (
        times[n_iters // 2 - 1] + times[n_iters // 2])
    return {'value': batch / median,            # sustained (median)
            'peak': batch / times[0],           # best-of (old protocol)
            'mean': batch / (sum(times) / n_iters)}


def build_model(precision='bf16'):
    from fitv2_tpu.models.fit import FiT
    # FiTv2-XL/2 (reference configs/fitv2/config_fitv2_xl.yaml:25-47):
    # hidden 1152, depth 36, heads 16, SwiGLU, QK-LN, AdaLN-LoRA, velocity.
    return FiT(
        context_size=256, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288, custom_freqs='normal', max_cached_len=64,
        dtype=jnp.bfloat16, gemm_precision=precision)


def init_params(model):
    """bf16 random params for the bench model (shared across precisions).

    Init runs on host CPU: flax init materializes f32 params, and for the
    3B model the f32 originals (11.9 GB) plus the bf16 casts would exceed
    the chip's 15.75 GB HBM if initialized on-device. Only the bf16 copy
    is transferred.
    """
    n_ctx = model.context_size
    cpu = jax.devices('cpu')[0]
    from fitv2_tpu.utils.compile_cache import persistent_cache_disabled
    with persistent_cache_disabled(), jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        grid1 = jnp.zeros((1, 2, n_ctx), jnp.int32)
        size1 = jnp.asarray([[[16, 16]]], jnp.int32)
        params = jax.jit(model.init)(
            rng, jnp.zeros((1, n_ctx, 16), jnp.float32), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), grid1, None, size1)['params']
        params = jax.tree_util.tree_map(
            lambda p: (p.astype(jnp.bfloat16) if p.dtype == jnp.float32
                       else p), params)
    dev = jax.devices()[0]
    if dev != cpu:
        params = jax.device_put(params, dev)
    return params


def main():
    model = build_model()
    n_h = n_w = 16  # 256px / 8 (VAE) / 2 (patch)
    n_ctx = model.context_size
    b2 = 2 * BATCH  # CFG double batch

    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, n_ctx)), jnp.int32)
    # full 16x16 grid: mask statically absent (models/fit.py mask=None path);
    # the reference sampler's mask here is all-ones (sample_fitv2_ddp.py:263)
    mask = None
    size = jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([
        (jnp.arange(BATCH) % 1000).astype(jnp.int32),
        jnp.full((BATCH,), 1000, jnp.int32)])

    params = init_params(model)

    sigmas = jnp.linspace(0.0, 1.0, STEPS + 1)

    def measure(model, extra):
        @jax.jit
        def sample(params, extra, z):
            def step(z, pair):
                t_cur, t_next = pair[0], pair[1]
                z2 = jnp.concatenate([z, z], axis=0)
                t2 = jnp.full((b2,), t_cur, jnp.float32)
                out = model.apply({'params': params, **extra}, z2, t2, y,
                                  grid, mask, size)
                cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
                v = uncond + CFG_SCALE * (cond - uncond)
                return z + (t_next - t_cur) * v, None

            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            z, _ = jax.lax.scan(step, z, pairs)
            return z

        z0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, n_ctx, 16),
                               jnp.float32)
        sample(params, extra, z0).block_until_ready()  # compile + warmup
        return _timed(lambda: sample(params, extra, z0))

    stats = measure(model, {})
    img_per_sec = stats['value']

    # NOTE on scope: this times the denoise scan ONLY. The full pipeline
    # (unpatchify + VAE decode + device->host + npz) adds ~0.5% at 250
    # steps — measured on-chip by tools/fid_rehearsal.py; the full-pipeline
    # number lives in PARITY.md ("FID PIPELINE").
    result = {
        'metric': 'FiTv2-XL 256x256 250-step ODE CFG sampling',
        'value': round(img_per_sec, 4),
        'unit': 'images/sec/chip',
        'vs_baseline': round(img_per_sec / BASELINE_IMG_PER_SEC, 4),
        'value_peak': round(stats['peak'], 4),
        'value_mean': round(stats['mean'], 4),
    }

    # secondary serving modes. Best-effort, but NEVER silent: a failing
    # mode records its error string in the JSON (the round-4 `except: pass`
    # would have quietly shrunk the driver artifact on a regression).
    def _mode(name, fn):
        try:
            v = fn()
            result[f'{name}_value'] = round(v, 4)
            result[f'{name}_vs_baseline'] = round(
                v / BASELINE_IMG_PER_SEC, 4)
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            result.setdefault('serving_errors', {})[name] = (
                f'{type(e).__name__}: {e}'[:300])

    # int8 W8A8 serving (calibrated static scales + prequantized weights,
    # ops/quant.py; velocity-field fidelity vs bf16 cos=0.9996). The
    # headline stays bf16 — the distribution-parity path.
    state = {}

    def _int8():
        mq = build_model('int8')
        from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                         prequantize_weights)
        zc = jax.random.normal(jax.random.PRNGKey(9), (b2, n_ctx, 16),
                               jnp.float32)
        batches = [(zc * s, jnp.full((b2,), t, jnp.float32), y, grid, mask,
                    size) for s, t in ((1.0, 0.05), (0.8, 0.5), (0.7, 0.9))]
        extra = {
            'quant_calib': calibrate_quant_scales(mq, params, batches),
            'quant_weights': prequantize_weights(mq, params, batches[0]),
        }
        state['mq'], state['extra'] = mq, extra
        return measure(mq, extra)['value']

    def _serving(name, **cfg_kw):
        """Composed serving configs through sample/pipeline.build_sampler,
        reusing the EXACT int8 calibration measured above (the one backed
        by the cos=0.9996 fidelity evidence)."""
        from fitv2_tpu.sample import SamplingConfig, build_sampler
        scfg = SamplingConfig(
            image_height=256, image_width=256, num_sampling_steps=STEPS,
            cfg_scale=CFG_SCALE, per_device_batch=BATCH,
            dtype=jnp.bfloat16, **cfg_kw)
        sfn = build_sampler(state['mq'], params, scfg,
                            quant_collections=state['extra'])
        labels = (jnp.arange(BATCH) % 1000).astype(jnp.int32)
        rngl = jax.random.PRNGKey(1)
        sfn(rngl, labels).block_until_ready()
        return _timed(lambda: sfn(rngl, labels))['value']

    _mode('int8_serving', _int8)
    if 'mq' in state:
        # max serving mode: int8 GEMMs + guidance-interval CFG [0.3, 0.9] +
        # velocity-extrapolated Euler (eval_every=2, order=2 Newton).
        # Training-free approximation: lands on the trained overfit anchor
        # at the same relL2 as dense CFG (tests/test_overfit_e2e.py),
        # FID-at-scale unverified — labeled separately from exact paths.
        _mode('serving_max_int8_interval_extrap2',
              lambda: _serving('max', guidance_low=0.3, guidance_high=0.9,
                               velocity_eval_every=2,
                               velocity_extrap_order=2))
        # int8 + guidance interval [0.3, 0.9] (EXACT ladder — no velocity
        # approximation): CFG double-batch only inside the window, single
        # conditional forward outside (the reference's own LwD window
        # semantics, fit_model_lwd_bk.py:1332, lifted to the FM Euler path).
        _mode('int8_interval_guidance',
              lambda: _serving('interval', guidance_low=0.3,
                               guidance_high=0.9))

    print(json.dumps(result))


if __name__ == '__main__':
    main()
