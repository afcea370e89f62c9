"""XL train-step throughput probe: remat policy x mu_dtype (VERDICT #5).

Round-1 baseline: 81.9 img/s/chip at batch 16 (full remat, fp32 mu) —
34 ms fwd + 113 ms full-remat bwd + ~35 ms optimizer/EMA traffic.

Measures steady-state step time over pipelined dispatches (the tunnel's
~36 ms single-call latency amortizes across queued steps).
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

BATCH = int(_os.environ.get('TRAIN_PROBE_BATCH', '16'))
# fp32 (default) = the production Trainer state (fp32 params/nu/EMA,
# bf16 mu); 'bf16' = the all-bf16 state earlier rounds measured
STATE_DTYPE = _os.environ.get('TRAIN_PROBE_DTYPE', 'fp32')
# 256 = the XL pretrain geometry; 1024 = the HR-XL fine-tune stage
# (512px, online decoupled NTK RoPE — reference
# configs/fitv2/config_fitv2_hr_xl.yaml:40-47,62-64)
CTX = int(_os.environ.get('TRAIN_PROBE_CTX', '256'))


def run(remat_policy: str, mu_dtype):
    from fitv2_tpu.flow.transport import create_transport
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer,
        make_train_step)

    hr = CTX > 256
    model = FiT(
        context_size=CTX, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288,
        custom_freqs='ntk-aware' if hr else 'normal',
        online_rope=hr, decouple=hr, ori_max_pe_len=16 if hr else None,
        max_cached_len=64,
        use_checkpoint=(remat_policy != 'none'),
        remat_policy=remat_policy if remat_policy != 'none' else 'full',
        dtype=jnp.bfloat16)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        mu_dtype=mu_dtype))
    step = jax.jit(make_train_step(model, transport, tx),
                   donate_argnums=(0,))

    n_h = n_w = int(CTX ** 0.5)
    assert n_h * n_w == CTX, 'TRAIN_PROBE_CTX must be a square'
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    batch = {
        'feature': jnp.asarray(np.random.default_rng(0).standard_normal(
            (BATCH, CTX, 16)), jnp.float32),
        'grid': jnp.asarray(np.broadcast_to(grid, (BATCH, 2, CTX)),
                            jnp.int32),
        'mask': jnp.ones((BATCH, CTX), jnp.float32),
        'label': (jnp.arange(BATCH) % 1000).astype(jnp.int32),
        'size': jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]),
                                            (BATCH, 1, 2)), jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    import functools
    params = jax.jit(functools.partial(model.init, train=True))(
        {'params': rng, 'label_dropout': rng}, batch['feature'][:1],
        jnp.zeros((1,)), batch['label'][:1], batch['grid'][:1],
        batch['mask'][:1], batch['size'][:1])['params']
    if STATE_DTYPE == 'bf16':
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
            else p, params)
    state = create_train_state(params, tx)

    print(f'compiling remat={remat_policy} mu={mu_dtype}...', flush=True)
    state, m = step(state, batch, rng)
    jax.block_until_ready(m['loss'])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / iters
    print(f'train[remat={remat_policy:4s} mu={str(mu_dtype):8s}]: '
          f'{dt*1e3:7.2f} ms/step  {BATCH/dt:6.1f} img/s/chip  '
          f'loss={float(m["loss"]):.4f}', flush=True)


def run_scan(remat_policy: str, mu_dtype, l1=4, l2=16):
    """In-graph scan diff-timing variant: K train steps inside ONE jitted
    lax.scan — immune to per-dispatch runtime artifacts (the plain 20-call
    loop measured an impossible 0.55 ms/step for remat=full; per-output
    readiness in the tunnel runtime appears to decouple the blocked-on loss
    from the full step)."""
    import functools

    from fitv2_tpu.flow.transport import create_transport
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer,
        make_train_step)

    hr = CTX > 256
    model = FiT(
        context_size=CTX, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288,
        custom_freqs='ntk-aware' if hr else 'normal',
        online_rope=hr, decouple=hr, ori_max_pe_len=16 if hr else None,
        max_cached_len=64,
        use_checkpoint=(remat_policy != 'none'),
        remat_policy=remat_policy if remat_policy != 'none' else 'full',
        dtype=jnp.bfloat16)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        mu_dtype=mu_dtype))
    step_fn = make_train_step(model, transport, tx)

    n_h = n_w = int(CTX ** 0.5)
    assert n_h * n_w == CTX, 'TRAIN_PROBE_CTX must be a square'
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    batch = {
        'feature': jnp.asarray(np.random.default_rng(0).standard_normal(
            (BATCH, CTX, 16)), jnp.float32),
        'grid': jnp.asarray(np.broadcast_to(grid, (BATCH, 2, CTX)),
                            jnp.int32),
        'mask': jnp.ones((BATCH, CTX), jnp.float32),
        'label': (jnp.arange(BATCH) % 1000).astype(jnp.int32),
        'size': jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]),
                                            (BATCH, 1, 2)), jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(model.init, train=True))(
        {'params': rng, 'label_dropout': rng}, batch['feature'][:1],
        jnp.zeros((1,)), batch['label'][:1], batch['grid'][:1],
        batch['mask'][:1], batch['size'][:1])['params']
    if STATE_DTYPE == 'bf16':
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
            else p, params)
    state0 = create_train_state(params, tx)

    def make(length):
        # donate the state (the Trainer's donate_argnums=(0,)): without it
        # the harness keeps input+output state copies resident and OOMs
        # the fp32 state at batches the real train step fits
        @functools.partial(jax.jit, donate_argnums=0)
        def run_k(state):
            def body(state, i):
                new_state, m = step_fn(state, batch,
                                       jax.random.fold_in(rng, i))
                return new_state, m['loss']
            state, losses = jax.lax.scan(body, state, jnp.arange(length))
            return state, losses[-1]
        return run_k

    f1, f2 = make(l1), make(l2)
    print(f'compiling scan remat={remat_policy}...', flush=True)
    state = state0
    for f in (f1, f2):  # compile + warm (donation consumes the argument)
        state, loss = f(state)
        jax.block_until_ready(loss)
    t0 = time.perf_counter()
    state, loss = f1(state)
    jax.block_until_ready((state, loss))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, loss = f2(state)
    jax.block_until_ready((state, loss))
    t2 = time.perf_counter() - t0
    dt = (t2 - t1) / (l2 - l1)
    print(f'train-scan[remat={remat_policy:4s} mu={str(mu_dtype):8s}]: '
          f'{dt*1e3:7.2f} ms/step  {BATCH/dt:6.1f} img/s/chip', flush=True)


if __name__ == '__main__':
    combos = sys.argv[1:] or ['full:f32', 'dots:f32', 'dots:bf16']
    print(f'backend: {jax.default_backend()}  batch={BATCH} ctx={CTX} state={STATE_DTYPE}', flush=True)
    for c in combos:
        mode_policy, mu = (c.split(':') + ['f32'])[:2]
        mu_d = jnp.bfloat16 if mu == 'bf16' else None
        try:
            if mode_policy.startswith('scan-'):
                run_scan(mode_policy[5:], mu_d)
            else:
                run(mode_policy, mu_d)
        except Exception as e:  # OOMs shouldn't abort the remaining combos
            print(f'train[{c}]: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:160]}', flush=True)
    print('DONE', flush=True)
