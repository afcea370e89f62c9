"""Capture a jax.profiler trace of the north-star sampler step and print the
per-op time breakdown (aggregated by op category) from the XLA device trace.

This replaces guesswork ablations: the xplane trace records every fusion's
device occupancy, so we can see exactly where the step time goes
(GEMM vs attention softmax chain vs elementwise vs adaLN smalls).

CAUTION: through the axon tunnel the op table has shown entries that stay
BIT-IDENTICAL across runs even after the op was removed from the graph
(e.g. attn/reduce_sum 43.512 ms in every session profile) — suspected
stale/aggregated remote profiler state. Trust the TOTAL device self-time
and the ops that CHANGE across configs; cross-validate totals against
big-call wall time (bench.py). See memory note axon-lazy-execution.

Run (TPU, from /root/repo): python tools/profile_sampler.py [batch] [bf16|int8|int8cal]
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

import glob
import gzip
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_step(batch, precision='bf16'):
    from perf_probe_r2 import build_xl, make_inputs, init_params
    b2 = 2 * batch
    model = build_xl('auto')
    calib = None
    if precision != 'bf16':
        model = model.clone(gemm_precision='int8')
    if precision == 'int8cal':
        pass  # calibrated below after params exist
    grid, mask, size, _ = make_inputs(b2)
    # full-grid sampling: mask statically absent (bench.py graph since the
    # models/fit.py mask=None path landed)
    mask = None
    y = jnp.concatenate([(jnp.arange(batch) % 1000).astype(jnp.int32),
                         jnp.full((batch,), 1000, jnp.int32)])
    params = init_params(model, grid, mask, size, y)
    sigmas = jnp.linspace(0.0, 1.0, 251)

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
        print('calibrated + prequantized; sites:',
              len(jax.tree_util.tree_leaves(extra['quant_calib'])),
              flush=True)

    @jax.jit
    def sample20_inner(params, extra, z):
        def step(z, pair):
            t_cur, t_next = pair[0], pair[1]
            z2 = jnp.concatenate([z, z], axis=0)
            t2 = jnp.full((b2,), t_cur, jnp.float32)
            out = model.apply({'params': params, **extra}, z2, t2, y, grid,
                              mask, size)
            cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
            v = uncond + 1.5 * (cond - uncond)
            return z + (t_next - t_cur) * v, None

        pairs = jnp.stack([sigmas[:21][:-1], sigmas[:21][1:]], axis=-1)
        z, _ = jax.lax.scan(step, z, pairs)
        return z

    # extra rides as a jit ARGUMENT: closing over prequantized int8 kernels
    # embeds them as HLO constants and the remote compile rejects the
    # payload (HTTP 413)
    def sample20(params, z):
        return sample20_inner(params, extra, z)

    z0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 16),
                           jnp.float32)
    return sample20, params, z0


def aggregate_trace(logdir, top=40):
    """Per-op device self-time table from the xplane (framework_op_stats)."""
    import csv
    import io
    from xprof.convert import raw_to_tool_data as rtd
    xplanes = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                        recursive=True)
    if not xplanes:
        print('NO XPLANE FOUND under', logdir)
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode('utf-8', errors='replace')
    tables = json.loads(data)  # gviz DataTable(s)
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c['id'] for c in table['cols']]
    rows = []
    for r in table['rows']:
        vals = [c.get('v') if isinstance(c, dict) else c for c in r['c']]
        rows.append(dict(zip(cols, vals)))
    dev = [r for r in rows
           if str(r.get('host_or_device', '')).lower() == 'device']
    key = next((k for k in ('total_self_time', 'self_time',
                            'total_self_time_us') if k in cols), 'total_time')
    total = sum(float(r.get(key) or 0) for r in dev)
    dev.sort(key=lambda r: -float(r.get(key) or 0))
    print(f'{"op (device, name tail)":72s} {"type":16s} '
          f'{"self ms":>9s}  {"%":>5s}  n')
    for r in dev[:top]:
        us = float(r.get(key) or 0)
        name = str(r.get('operation', '?'))
        print(f'{name[-72:]:72s} {str(r.get("type", ""))[:16]:16s} '
              f'{us/1e3:9.3f}  {100*us/max(total,1e-9):5.1f}  '
              f'{r.get("occurrences", "")}')
    print(f'{"TOTAL device self":72s} {"":16s} {total/1e3:9.3f}')


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    precision = sys.argv[2] if len(sys.argv) > 2 else 'bf16'
    fn, params, z0 = build_step(batch, precision)
    print('compiling...', flush=True)
    fn(params, z0).block_until_ready()
    logdir = tempfile.mkdtemp(prefix='jaxprof_')
    print('tracing into', logdir, flush=True)
    with jax.profiler.trace(logdir):
        fn(params, z0).block_until_ready()
    t0 = time.perf_counter()
    fn(params, z0).block_until_ready()
    dt = time.perf_counter() - t0
    print(f'20-step scan wall: {dt*1e3:.1f} ms -> {dt/20*1e3:.2f} ms/step '
          f'(b2={2*batch})', flush=True)
    aggregate_trace(logdir)


if __name__ == '__main__':
    main()
