"""Microbench: MXU rate for the exact FiTv2-XL GEMM shapes, bf16 and int8.

Establishes the single-chip speed-of-light for the sampler: per-forward GEMM
MACs at batch 16 are ~2.36 T (147 GMAC/img x 16). Prints TFLOP/s (MAC*2).
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


SHAPES = [  # (M, K, N) per XL block at CFG batch 16 (M = 16*256)
    ('qkv ', 4096, 1152, 3456),
    ('proj', 4096, 1152, 1152),
    ('fc1g', 4096, 1152, 3072),
    ('fc2 ', 4096, 3072, 1152),
]


def main():
    print('backend:', jax.default_backend(), flush=True)
    for mult in (1, 2, 4):
        for name, m, k, n in SHAPES:
            M = m * mult
            a = jnp.ones((M, k), jnp.bfloat16)
            b = jnp.ones((k, n), jnp.bfloat16)

            @jax.jit
            def f(a, b):
                return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.bfloat16)
            dt = timeit(f, a, b)
            tf = 2 * M * k * n / dt
            print(f'bf16 {name} M={M:6d}: {dt*1e6:8.1f} us  {tf/1e12:6.1f} TFLOP/s',
                  flush=True)

    # int8 rate (AQT-style): int8 x int8 -> int32
    for name, m, k, n in SHAPES:
        M = m * 2
        a = jnp.ones((M, k), jnp.int8)
        b = jnp.ones((k, n), jnp.int8)

        @jax.jit
        def f8(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        dt = timeit(f8, a, b)
        tf = 2 * M * k * n / dt
        print(f'int8 {name} M={M:6d}: {dt*1e6:8.1f} us  {tf/1e12:6.1f} TOP/s',
              flush=True)

    # full w8a8 emulation incl. quantize/dequant overhead
    M = 8192
    for name, m, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (M, k), jnp.bfloat16)
        w8 = jnp.ones((k, n), jnp.int8)
        wscale = jnp.ones((n,), jnp.float32)

        @jax.jit
        def q(x, w8, wscale):
            s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
            xi = jnp.round(x.astype(jnp.float32) * (127.0 / s)).astype(jnp.int8)
            acc = jax.lax.dot_general(xi, w8, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (s / 127.0) * wscale
                    ).astype(jnp.bfloat16)
        dt = timeit(q, x, w8, wscale)
        tf = 2 * M * k * n / dt
        print(f'w8a8 {name} M={M:6d}: {dt*1e6:8.1f} us  {tf/1e12:6.1f} TOP/s eff',
              flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
