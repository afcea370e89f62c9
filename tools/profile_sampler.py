"""Capture a jax.profiler trace of the north-star sampler step and print the
per-op time breakdown (aggregated by op category) from the XLA device trace.

This replaces guesswork ablations: the xplane trace records every fusion's
device occupancy, so we can see exactly where the 34 ms step goes
(GEMM vs attention softmax chain vs elementwise vs adaLN smalls).

Run (TPU): PYTHONPATH=/root/repo python tools/profile_sampler.py [batch]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
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


def build_step(batch):
    from perf_probe_r2 import build_xl, make_inputs, init_params
    b2 = 2 * batch
    model = build_xl('auto')
    grid, mask, size, _ = make_inputs(b2)
    y = jnp.concatenate([(jnp.arange(batch) % 1000).astype(jnp.int32),
                         jnp.full((batch,), 1000, jnp.int32)])
    params = init_params(model, grid, mask, size, y)
    sigmas = jnp.linspace(0.0, 1.0, 251)

    @jax.jit
    def sample20(params, z):
        def step(z, pair):
            t_cur, t_next = pair[0], pair[1]
            z2 = jnp.concatenate([z, z], axis=0)
            t2 = jnp.full((b2,), t_cur, jnp.float32)
            out = model.apply({'params': params}, z2, t2, y, grid, mask,
                              size)
            cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
            v = uncond + 1.5 * (cond - uncond)
            return z + (t_next - t_cur) * v, None

        pairs = jnp.stack([sigmas[:21][:-1], sigmas[:21][1:]], axis=-1)
        z, _ = jax.lax.scan(step, z, pairs)
        return z

    z0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 16),
                           jnp.float32)
    return sample20, params, z0


def aggregate_trace(logdir):
    """Parse the trace and aggregate device-op self-times by name bucket."""
    from xprof.convert import raw_to_tool_data as rtd
    xplanes = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                        recursive=True)
    if not xplanes:
        print('NO XPLANE FOUND under', logdir)
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, 'trace_viewer', {})
    if isinstance(data, bytes):
        data = data.decode('utf-8', errors='replace')
    trace = json.loads(data)
    events = trace.get('traceEvents', [])
    # device-side complete events: pid of TPU core planes
    byname = {}
    total = 0.0
    for ev in events:
        if ev.get('ph') != 'X':
            continue
        name = ev.get('name', '')
        # keep XLA op events only (skip steps/launch markers)
        args = ev.get('args') or {}
        if 'run_id' in args or name.startswith('Step'):
            continue
        dur = float(ev.get('dur', 0.0))  # us
        cat = bucket(name, args)
        if cat is None:
            continue
        byname[cat] = byname.get(cat, 0.0) + dur
        total += dur
    for cat, us in sorted(byname.items(), key=lambda kv: -kv[1]):
        print(f'{cat:28s} {us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%')
    print(f'{"TOTAL device":28s} {total/1e3:9.3f} ms')


def bucket(name, args):
    n = name.lower()
    if 'pid' in args and not isinstance(args, dict):
        return None
    if n.startswith(('infeed', 'outfeed', 'host')):
        return None
    if 'fusion' in n or n.startswith(('%', 'loop_')) or True:
        # categorize by content keywords
        if 'conv' in n or 'dot' in n or 'gemm' in n or 'matmul' in n:
            return 'dot/conv fusions'
        if 'softmax' in n or 'exp' in n or 'reduce' in n:
            return 'reduce/softmax fusions'
        if 'copy' in n or 'transpose' in n or 'bitcast' in n:
            return 'copy/transpose'
        if 'scatter' in n or 'gather' in n or 'dynamic' in n:
            return 'gather/dynamic'
        if 'custom' in n or 'pallas' in n:
            return 'pallas/custom'
        return 'other:' + n.split('.')[0][:20]
    return 'misc'


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fn, params, z0 = build_step(batch)
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
