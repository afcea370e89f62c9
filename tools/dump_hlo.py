"""Dump the optimized HLO of one FiTv2-XL forward (bf16 or int8cal) and
summarize fusion boundaries: every top-level instruction with shape/bytes,
so we can see which converts/exp/reduce passes are standalone HBM round
trips vs fused epilogues.

Run (TPU): python tools/dump_hlo.py [bf16|int8cal] [outfile]
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

import re
import sys

import jax
import jax.numpy as jnp


def main():
    precision = sys.argv[1] if len(sys.argv) > 1 else 'int8cal'
    outfile = sys.argv[2] if len(sys.argv) > 2 else f'/tmp/hlo_{precision}.txt'
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    from perf_probe_r2 import build_xl, make_inputs, init_params
    b2 = 2 * batch
    model = build_xl('auto')
    if precision != 'bf16':
        model = model.clone(gemm_precision='int8')
    grid, mask, size, _ = make_inputs(b2)
    mask = None
    y = jnp.concatenate([(jnp.arange(batch) % 1000).astype(jnp.int32),
                         jnp.full((batch,), 1000, jnp.int32)])
    params = init_params(model, grid, mask, size, y)

    extra = {}
    if precision == 'int8cal':
        from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                         prequantize_weights)
        z = jax.random.normal(jax.random.PRNGKey(9), (b2, 256, 16),
                              jnp.float32)
        t = jnp.full((b2,), 0.5, jnp.float32)
        args = (z, t, y, grid, mask, size)
        extra['quant_calib'] = calibrate_quant_scales(model, params, [args])
        extra['quant_weights'] = prequantize_weights(model, params, args)
        print('calibrated', flush=True)

    def fwd(params, extra, z, t):
        return model.apply({'params': params, **extra}, z, t, y, grid, mask,
                           size)

    z = jax.random.normal(jax.random.PRNGKey(1), (b2, 256, 16), jnp.float32)
    t = jnp.full((b2,), 0.5, jnp.float32)
    print('lower+compile...', flush=True)
    compiled = jax.jit(fwd).lower(params, extra, z, t).compile()
    txt = compiled.as_text()
    with open(outfile, 'w') as f:
        f.write(txt)
    print(f'wrote {outfile} ({len(txt)/1e6:.1f} MB)', flush=True)

    # summary: in the while-body (scan over blocks), list instructions
    print('--- top-level ops inside the block-scan body ---', flush=True)
    m = re.search(r'%while_body[^{]*\{(.*?)\n\}', txt, re.S)
    body = m.group(1) if m else txt
    for line in body.splitlines():
        line = line.strip()
        mm = re.match(r'%?([\w.\-]+) = (\S+) (fusion|dot|convert|custom-call|'
                      r'reduce|exponential|transpose|copy)\(', line)
        if mm:
            kind = mm.group(3)
            shape = mm.group(2)
            # fusion kind annotation
            fk = re.search(r'kind=(\w+)', line)
            cal = re.search(r'calls=%?([\w.\-]+)', line)
            print(f'{kind:12s} {shape:40s} '
                  f'{fk.group(1) if fk else "":10s} '
                  f'{cal.group(1) if cal else ""}'[:140], flush=True)


if __name__ == '__main__':
    main()
