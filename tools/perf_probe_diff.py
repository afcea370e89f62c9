"""Differential occupancy probe: long-scan pairs cancel fixed dispatch cost.

The axon tunnel adds ~36 ms latency per jitted call and ~1 ms per queued
dispatch, so single-call timings of sub-millisecond ops are meaningless
(tools/gemm_probe*.py history). Here every measurement is
(T(scan L2) - T(scan L1)) / (L2 - L1) inside ONE jit call each — pure
device occupancy per iteration.

Stages:
  gemm   — the four XL GEMM shapes
  attn   — attention-chain variants (XLA vs fused megakernel)
  block  — one full FiTBlock (hot config) vs sum of parts
  fwd    — full XL forward step occupancy (sampler-style)
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
# NOTE: do NOT set PYTHONPATH=/root/repo instead — it breaks the axon
# TPU plugin registration (backend 'axon' fails to initialize).

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

L1, L2 = 36, 144


def diff_time(make_scan, x0):
    f1, f2 = make_scan(L1), make_scan(L2)
    out = f1(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f1(x0)
    jax.block_until_ready(out)
    t1 = time.perf_counter() - t0
    out = f2(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f2(x0)
    jax.block_until_ready(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (L2 - L1)


def stage_gemm():
    """True GEMM occupancy. The feedback folds EVERY output column back
    into the carry (pad n up to a multiple of k, reshape, sum) — a naive
    `y[:, :k]` feedback lets XLA dead-code-eliminate the unused columns of
    wide GEMMs, which is how round-1 recorded impossible >197 TFLOP/s
    readings (v5e bf16 peak) for the qkv/fc1 shapes."""
    shapes = [('qkv ', 4096, 1152, 3456), ('proj', 4096, 1152, 1152),
              ('fc1g', 4096, 1152, 3072), ('fc1f', 4096, 1152, 6144),
              ('fc2 ', 4096, 3072, 1152), ('sq4k', 4096, 4096, 4096)]
    for name, m, k, n in shapes:
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                              jnp.bfloat16) * (k ** -0.5)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        c = -(-n // k)  # chunks of k columns

        def make(length):
            @jax.jit
            def run(x):
                def body(x, _):
                    y = jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if c * k != n:
                        y = jnp.pad(y, ((0, 0), (0, c * k - n)))
                    x2 = y.reshape(m, c, k).sum(1).astype(jnp.bfloat16)
                    return x2 * 1e-3, None
                x, _ = jax.lax.scan(body, x, None, length=length)
                return x
            return run
        dt = diff_time(make, x0)
        print(f'gemm {name}: {dt*1e6:8.1f} us  '
              f'{2*m*k*n/dt/1e12:6.1f} TFLOP/s', flush=True)


def stage_qgemm():
    """int8 W8A8 path at the XL shapes: full (quant+dot+dequant) vs the
    pure int8 dot, to separate MXU rate from quantization overhead."""
    from fitv2_tpu.ops.quant import int8_matmul, quantize_symmetric
    shapes = [('qkv ', 4096, 1152, 3456), ('proj', 4096, 1152, 1152),
              ('fc1f', 4096, 1152, 6144), ('fc2 ', 4096, 3072, 1152)]
    for name, m, k, n in shapes:
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                              jnp.bfloat16) * (k ** -0.5)
        wq, ws = quantize_symmetric(w, axis=0)
        ws = ws.reshape(1, -1)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        c = -(-n // k)

        def fold(y):
            if c * k != n:
                y = jnp.pad(y, ((0, 0), (0, c * k - n)))
            return (y.reshape(m, c, k).sum(1) * 1e-3).astype(jnp.bfloat16)

        def make_full(length):
            @jax.jit
            def run(x):
                def body(x, _):
                    return fold(int8_matmul(x, wq, ws)), None
                x, _ = jax.lax.scan(body, x, None, length=length)
                return x
            return run

        xq0 = jnp.clip(jnp.round(x0.astype(jnp.float32)), -127, 127
                       ).astype(jnp.int8)

        def make_dot(length):
            @jax.jit
            def run(xq):
                def body(xq, _):
                    y = jax.lax.dot_general(
                        xq, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    if c * k != n:
                        y = jnp.pad(y, ((0, 0), (0, c * k - n)))
                    s = y.reshape(m, c, k).sum(1)
                    return jnp.clip(s >> 8, -127, 127).astype(jnp.int8), None
                xq, _ = jax.lax.scan(body, xq, None, length=length)
                return xq
            return run

        dt_f = diff_time(make_full, x0)
        dt_d = diff_time(make_dot, xq0)
        print(f'qgemm {name}: full {dt_f*1e6:7.1f} us '
              f'({2*m*k*n/dt_f/1e12:6.1f} TOP/s eff)  '
              f'dot-only {dt_d*1e6:7.1f} us '
              f'({2*m*k*n/dt_d/1e12:6.1f} TOP/s)', flush=True)


def stage_swiglu():
    """Clean fused-vs-split fc1 A/B: the full SwiGLU MLP (fc1 -> silu*mul
    -> fc2) with identical feedback, so epilogue costs cancel."""
    m, k, h = 4096, 1152, 3072
    key = jax.random.PRNGKey(0)
    wg = jax.random.normal(key, (k, h), jnp.bfloat16) * (k ** -0.5)
    wx = jax.random.normal(jax.random.PRNGKey(1), (k, h),
                           jnp.bfloat16) * (k ** -0.5)
    wf = jnp.concatenate([wg, wx], axis=-1)  # fused [g | x]
    w2 = jax.random.normal(jax.random.PRNGKey(2), (h, k),
                           jnp.bfloat16) * (h ** -0.5)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (m, k), jnp.bfloat16)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def split_mlp(x):
        g = mm(x, wg).astype(jnp.bfloat16)
        v = mm(x, wx).astype(jnp.bfloat16)
        return mm(jax.nn.silu(g) * v, w2).astype(jnp.bfloat16)

    def fused_mlp(x):
        gv = mm(x, wf).astype(jnp.bfloat16)
        g, v = jnp.split(gv, 2, axis=-1)
        return mm(jax.nn.silu(g) * v, w2).astype(jnp.bfloat16)

    for name, f in (('split', split_mlp), ('fused', fused_mlp)):
        def make(length, f=f):
            @jax.jit
            def run(x):
                def body(x, _):
                    return f(x) * 1e-1, None
                x, _ = jax.lax.scan(body, x, None, length=length)
                return x
            return run
        dt = diff_time(make, x0)
        fl = 2 * m * k * h * 2 + 2 * m * h * k
        print(f'swiglu {name}: {dt*1e6:8.1f} us  {fl/dt/1e12:6.1f} TFLOP/s',
              flush=True)


def stage_attn():
    from fitv2_tpu.ops import fused_attention as fa
    B, N, H, Dh = 16, 256, 16, 72
    C = H * Dh
    qkv0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C),
                             jnp.bfloat16)
    cos = jax.random.normal(jax.random.PRNGKey(1), (B, N, Dh), jnp.bfloat16)
    sin = jax.random.normal(jax.random.PRNGKey(2), (B, N, Dh), jnp.bfloat16)
    mask = jnp.ones((B, N), jnp.float32)

    def bench(f, tag):
        def make(length):
            @jax.jit
            def run(qkv):
                def body(x, _):
                    o = f(x)
                    return jnp.concatenate([o, o, x[..., 2 * C:]], -1), None
                out, _ = jax.lax.scan(body, qkv, None, length=length)
                return out
            return run
        dt = diff_time(make, qkv0)
        print(f'attn {tag}: {dt*1e6:8.1f} us/call', flush=True)

    bench(lambda x: fa._reference_chain(x, cos, sin, mask, H, 1e-6, True,
                                        True), 'xla-chain        ')
    bench(lambda x: fa.fused_qkln_rope_attention(x, cos, sin, mask, H),
          'fused-megakernel ')


def stage_block():
    from fitv2_tpu.models.modules import FiTBlock
    B, N, D, H = 16, 256, 1152, 16
    Dh = D // H
    for impl, quant in (('auto', False), ('auto', True), ('fused', False)):
        block = FiTBlock(hidden_size=D, num_heads=H, swiglu=True,
                         q_norm='layernorm', k_norm='layernorm',
                         adaln_type='lora', adaln_lora_dim=288,
                         dtype=jnp.bfloat16, attn_impl=impl,
                         rope_layout='split', quantized=quant)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, D), jnp.bfloat16)
        c = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.bfloat16)
        cos = jax.random.normal(jax.random.PRNGKey(2), (B, N, Dh),
                                jnp.bfloat16)
        sin = jax.random.normal(jax.random.PRNGKey(3), (B, N, Dh),
                                jnp.bfloat16)
        mask = jnp.ones((B, N), jnp.float32)
        params = block.init(jax.random.PRNGKey(0), x0, c, mask, cos, sin)

        def make(length):
            @jax.jit
            def run(x):
                def body(x, _):
                    return block.apply(params, x, c, mask, cos, sin), None
                x, _ = jax.lax.scan(body, x, None, length=length)
                return x
            return run
        dt = diff_time(make, x0)
        tag = impl + ('/int8' if quant else '')
        print(f'block[{tag:10s}]: {dt*1e6:8.1f} us  '
              f'(36x = {dt*36*1e3:6.2f} ms)', flush=True)


def stage_fwd():
    sys.path.insert(0, '/root/repo/tools')
    from perf_probe_r2 import build_xl, make_inputs, init_params
    B2 = 16
    grid, mask, size, y = make_inputs(B2)
    t = jnp.full((B2,), 0.5, jnp.float32)
    model = build_xl('auto')
    params = init_params(model, grid, mask, size, y)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B2, 256, 16),
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

    def diff(l1, l2):
        f1, f2 = make(l1), make(l2)
        for f in (f1, f2):
            jax.block_until_ready(f(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(f1(x0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(f2(x0))
        t2 = time.perf_counter() - t0
        return (t2 - t1) / (l2 - l1)

    dt = diff(10, 40)
    eff = 2 * 0.294e12 * (B2 / 2) / dt
    print(f'fwd occupancy: {dt*1e3:8.3f} ms  ({eff/1e12:6.1f} TFLOP/s eff)',
          flush=True)


if __name__ == '__main__':
    print('backend:', jax.default_backend(), flush=True)
    for s in sys.argv[1:] or ['gemm', 'attn', 'block']:
        {'gemm': stage_gemm, 'qgemm': stage_qgemm, 'attn': stage_attn,
         'swiglu': stage_swiglu, 'block': stage_block,
         'fwd': stage_fwd}[s]()
    print('DONE', flush=True)
