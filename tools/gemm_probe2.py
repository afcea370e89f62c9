"""Honest MXU-rate probe: serialized scans with data dependence.

gemm_probe.py v1 measured impossible rates (up to 5 PFLOP/s) because 50
independent dispatches of an identical computation were deduplicated /
overlapped by the remote-execution path. Here each GEMM feeds the next scan
iteration, forcing sequential execution inside one jit.

Also probes: attention-chain variants and the train-step costs.
"""

import sys
import time

import jax
import jax.numpy as jnp

ITERS = 36


def rate(dt_total, macs):
    return 2 * macs * ITERS / dt_total


def timed(run, x):
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    return min(t1 - t0, time.perf_counter() - t1)


SHAPES = [
    ('qkv ', 4096, 1152, 3456),
    ('proj', 4096, 1152, 1152),
    ('fc1g', 4096, 1152, 3072),
    ('fc2 ', 4096, 3072, 1152),
]


def stage_bf16():
    for name, m, k, n in SHAPES:
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(x, _):
                y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.bfloat16)
                # fold output back to (m, k) with a cheap slice+pad to keep
                # the chain data-dependent without a second matmul
                x2 = y[:, :k] if y.shape[1] >= k else jnp.pad(
                    y, ((0, 0), (0, k - y.shape[1])))
                return x2 * 1e-3, None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x
        dt = timed(run, x0)
        print(f'bf16 {name}: {dt/ITERS*1e6:8.1f} us  '
              f'{rate(dt, m*k*n)/1e12:6.1f} TFLOP/s', flush=True)


def stage_int8():
    for name, m, k, n in SHAPES:
        w = jnp.asarray(
            jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 127),
            jnp.int8)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(x, _):
                s = jnp.max(jnp.abs(x), axis=-1, keepdims=True
                            ).astype(jnp.float32) + 1e-6
                xi = jnp.round(
                    x.astype(jnp.float32) * (127.0 / s)).astype(jnp.int8)
                acc = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * (s / 127.0) * 1e-3
                     ).astype(jnp.bfloat16)
                x2 = y[:, :k] if y.shape[1] >= k else jnp.pad(
                    y, ((0, 0), (0, k - y.shape[1])))
                return x2, None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x
        dt = timed(run, x0)
        print(f'w8a8 {name}: {dt/ITERS*1e6:8.1f} us  '
              f'{rate(dt, m*k*n)/1e12:6.1f} TOP/s eff', flush=True)


def stage_attn():
    """Attention-chain micro-variants at (B=16, N=256, H=16, Dh=72)."""
    from fitv2_tpu.ops import fused_attention as fa
    B, N, H, Dh = 16, 256, 16, 72
    C = H * Dh
    qkv0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3 * C),
                             jnp.bfloat16)
    cos = jax.random.normal(jax.random.PRNGKey(1), (B, N, Dh), jnp.bfloat16)
    sin = jax.random.normal(jax.random.PRNGKey(2), (B, N, Dh), jnp.bfloat16)
    mask = jnp.ones((B, N), jnp.float32)

    def bench(f, tag):
        @jax.jit
        def run(qkv):
            def body(x, _):
                o = f(x)
                return jnp.concatenate([o, o, x[..., 2 * C:]], -1), None
            out, _ = jax.lax.scan(body, qkv, None, length=ITERS)
            return out
        dt = timed(run, qkv0)
        print(f'attn {tag}: {dt/ITERS*1e6:8.1f} us/call', flush=True)

    bench(lambda x: fa._reference_chain(x, cos, sin, mask, H, 1e-6, True,
                                        True), 'xla-chain          ')
    bench(lambda x: fa._reference_chain(x, cos, sin, None, H, 1e-6, True,
                                        True), 'xla-chain-nomask   ')
    bench(lambda x: fa.fused_qkln_rope_attention(x, cos, sin, mask, H),
          'fused-megakernel   ')


if __name__ == '__main__':
    print('backend:', jax.default_backend(), flush=True)
    for s in sys.argv[1:] or ['bf16', 'int8', 'attn']:
        {'bf16': stage_bf16, 'int8': stage_int8, 'attn': stage_attn}[s]()
    print('DONE', flush=True)
