"""Ablation decomposition of the int8 sampler step (round-3 VERDICT #1).

The remote profiler serves stale op tables and HLO memory-space annotations
are not a reliable HBM-traffic signal through this stack, so the only
trustworthy decomposition is differential WALL TIME of the multi-second
250-step bench scan with components ablated:

  full      the real int8cal bench step (baseline)
  noattn    masked_attention replaced by identity (out = v):
            full - noattn = today's attention-core cost/step
  nopre     noattn + qk_norm_rope replaced by passthrough:
            noattn - nopre = QK-LayerNorm + RoPE preamble cost/step

Ablations monkeypatch the module-level symbols in models.modules — probe
only, never product code. Run: python tools/ablate_probe.py [variants...]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 250
BATCH = 8


def main():
    variants = sys.argv[1:] or ['full', 'noattn', 'nopre']
    print('backend:', jax.devices(), flush=True)

    import fitv2_tpu.models.modules as modules
    from bench_sweep import build_model, init_params, make_sampler
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)

    params = init_params()
    model = build_model('int8')
    gw, gh = np.meshgrid(np.arange(16), np.arange(16))
    g = jnp.asarray(np.broadcast_to(
        np.stack([gw.reshape(-1), gh.reshape(-1)], 0), (16, 2, 256)),
        jnp.int32)
    sz = jnp.asarray(np.broadcast_to(np.array([[16, 16]]), (16, 1, 2)),
                     jnp.int32)
    yy = (jnp.arange(16) % 1000).astype(jnp.int32)
    zz = jax.random.normal(jax.random.PRNGKey(9), (16, 256, 16), jnp.float32)
    cal = calibrate_quant_scales(
        model, params,
        [(zz * s, jnp.full((16,), t, jnp.float32), yy, g, None, sz)
         for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))])
    qw = prequantize_weights(
        model, params, (zz, jnp.full((16,), 0.5, jnp.float32), yy, g, None,
                        sz))
    calib = {'quant_calib': cal, 'quant_weights': qw}

    orig_attn = modules.masked_attention

    import fitv2_tpu.ops.fused_qk_rope as fqr
    orig_qk = fqr.qk_norm_rope

    def attn_identity(q, k, v, mask=None, **kw):
        return v

    def attn_head_split(q, k, v, mask=None, **kw):
        # bounded-softmax chain over 2 head groups: halves the live
        # (B, H, N, N) logits tensor (33.5 -> 16.8 MB) hoping it earns the
        # alternate-memory assignment the full tensor is denied
        dh = q.shape[-1]
        scale = dh ** -0.5
        b, n, h, _ = v.shape
        outs = []
        for qg, kg, vg in zip(jnp.split(q, 2, axis=2),
                              jnp.split(k, 2, axis=2),
                              jnp.split(v, 2, axis=2)):
            logits = jnp.einsum('bqhd,bkhd->bhqk', qg, kg,
                                preferred_element_type=jnp.bfloat16)
            e = jnp.exp(logits.astype(jnp.float32) * scale).astype(vg.dtype)
            ve = jnp.concatenate(
                [vg, jnp.ones((b, n, h // 2, 1), vg.dtype)], axis=-1)
            o = jnp.einsum('bhqk,bkhd->bqhd', e, ve,
                           preferred_element_type=jnp.float32)
            outs.append((o[..., :dh] / o[..., dh:]).astype(vg.dtype))
        return jnp.concatenate(outs, axis=2)

    def qk_passthrough(q, k, cos, sin, eps=1e-6, norm_q=True, norm_k=True,
                       impl='auto'):
        return q, k

    import fitv2_tpu.ops.quant as _qmod
    _orig_matmul = _qmod.int8_matmul
    results = {}
    for variant in variants:
        modules.masked_attention = orig_attn
        fqr.qk_norm_rope = orig_qk
        _qmod.int8_matmul = _orig_matmul
        # models.modules imported qk_norm_rope lazily inside __call__ from
        # fitv2_tpu.ops.fused_qk_rope, so patching the module attr works.
        if variant in ('noattn', 'nopre'):
            modules.masked_attention = attn_identity
        if variant == 'hsplit':
            modules.masked_attention = attn_head_split
        if variant == 'nopre':
            fqr.qk_norm_rope = qk_passthrough

        impls = {'chunked': 'xla_chunked', 'core': 'pallas_core',
                 'flash': 'pallas'}
        m = (model.clone(attn_impl=impls[variant]) if variant in impls
             else model)
        if variant == 'bf16quant':
            # quantize arithmetic in bf16 (drops one convert pass per site)
            import fitv2_tpu.ops.quant as qmod
            _orig_int8_matmul = qmod.int8_matmul

            def int8_matmul_bf16q(x, w_q, w_scale, bias=None,
                                  out_dtype=jnp.bfloat16, act_scale=None):
                if act_scale is None:
                    return _orig_int8_matmul(x, w_q, w_scale, bias,
                                             out_dtype, None)
                inv = (1.0 / act_scale.astype(jnp.float32)).astype(x.dtype)
                xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                ws = w_scale.reshape((1,) * (y.ndim - 1) + (-1,))
                out = y.astype(jnp.float32) * (
                    act_scale.astype(jnp.float32) * ws)
                if bias is not None:
                    out = out + bias.astype(jnp.float32)
                return out.astype(out_dtype)

            qmod.int8_matmul = int8_matmul_bf16q
        sample, _ = make_sampler(m, BATCH, calib)
        z0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 16),
                               jnp.float32)
        print(f'compiling {variant}...', flush=True)
        sample(params, z0).block_until_ready()
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            out = sample(params, z0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        results[variant] = dt / STEPS
        print(f'{variant:8s}: {dt:7.3f} s -> {dt/STEPS*1e3:6.2f} ms/step',
              flush=True)

    modules.masked_attention = orig_attn
    fqr.qk_norm_rope = orig_qk
    _qmod.int8_matmul = _orig_matmul
    if 'full' in results and 'noattn' in results:
        print(f'attention core : '
              f'{(results["full"]-results["noattn"])*1e3:6.2f} ms/step',
              flush=True)
    if 'noattn' in results and 'nopre' in results:
        print(f'qk-ln/rope pre : '
              f'{(results["noattn"]-results["nopre"])*1e3:6.2f} ms/step',
              flush=True)


if __name__ == '__main__':
    main()
