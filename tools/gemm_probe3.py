"""GEMM-rate probe v3: isolate what gemm_probe2's 37 TFLOP/s came from.

Variants per shape:
  a) scan-chained, weights scaled 1/sqrt(k) so activations stay O(1),
     fp32 accumulation (preferred_element_type=f32) then cast
  b) same with bf16 preferred_element_type
  c) distinct-inputs burst: 36 different inputs dispatched back-to-back
     (no scan, no dedup possible), one block_until_ready
"""

import time

import jax
import jax.numpy as jnp

ITERS = 36

SHAPES = [
    ('qkv ', 4096, 1152, 3456),
    ('fc2 ', 4096, 3072, 1152),
    ('sqr ', 4096, 2048, 2048),
]


def main():
    print('backend:', jax.default_backend(), flush=True)
    for name, m, k, n in SHAPES:
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                              jnp.bfloat16) * (k ** -0.5)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        macs = m * k * n

        def chain(pref):
            @jax.jit
            def run(x):
                def body(x, _):
                    y = jax.lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=pref).astype(jnp.bfloat16)
                    x2 = y[:, :k] if y.shape[1] >= k else jnp.pad(
                        y, ((0, 0), (0, k - y.shape[1])))
                    return x2, None
                x, _ = jax.lax.scan(body, x, None, length=ITERS)
                return x
            return run

        for tag, pref in (('f32acc', jnp.float32), ('bf16acc', jnp.bfloat16)):
            run = chain(pref)
            out = run(x0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run(x0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f'{name} chain {tag:8s}: {dt*1e6:8.1f} us '
                  f'{2*macs/dt/1e12:6.1f} TFLOP/s', flush=True)

        # distinct-inputs burst
        xs = [jax.random.normal(jax.random.PRNGKey(i), (m, k), jnp.bfloat16)
              for i in range(ITERS)]

        @jax.jit
        def one(x):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        outs = [one(x) for x in xs]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [one(x) for x in xs]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / ITERS
        print(f'{name} burst distinct  : {dt*1e6:8.1f} us '
              f'{2*macs/dt/1e12:6.1f} TFLOP/s', flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
