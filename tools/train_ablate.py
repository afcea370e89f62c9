"""Wall-clock decomposition of the XL train step (round-4 VERDICT #2).

The sampler got a per-component ablation decomposition (tools/
ablate_probe.py); the train step's "~50% MFU, backward-dominated" was
asserted, not measured. Same method here: differential wall time of
in-graph K-step scans (tools/train_probe.py run_scan timing — immune to
the tunnel runtime's per-dispatch artifacts) with components ablated:

  full      the real train step: loss -> grads -> clip -> adamw -> EMA
  gradonly  loss -> grads -> global_norm only (no optimizer, no EMA):
            full - gradonly = optimizer + EMA cost/step
  fwdonly   loss only (no backward at all):
            gradonly - fwdonly = backward (+remat recompute) cost/step
  noattn    full with masked_attention -> identity:
            full - noattn = attention fwd+bwd+recompute cost/step
  nopre     noattn + qk_norm_rope passthrough

Run (TPU): python tools/train_ablate.py [variants...]
Env: TRAIN_ABLATE_BATCH (default 16), TRAIN_ABLATE_REMAT (default dots),
TRAIN_ABLATE_DTYPE (default fp32 = the production Trainer state: fp32
params/nu/EMA with bf16 mu; 'bf16' casts params to bf16 before
create_train_state — the lighter all-bf16 state earlier rounds measured,
which also freezes the EMA: decay 0.9999 underflows bf16, see
train/train_step.py update_ema).

Useful-FLOP MFU convention: 3x forward GEMM+attention FLOPs per step
(fwd + 2x bwd; remat recompute is overhead, not useful work).
utils/misc.flop_count_forward gives 304.4 GFLOP/sample at XL-256.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(_os.environ.get('TRAIN_ABLATE_BATCH', '16'))
REMAT = _os.environ.get('TRAIN_ABLATE_REMAT', 'dots')
STATE_DTYPE = _os.environ.get('TRAIN_ABLATE_DTYPE', 'fp32')
# 256 = XL pretrain; 1024 = the HR-XL 512px fine-tune geometry (online
# decoupled NTK RoPE, reference config_fitv2_hr_xl.yaml:40-47) — the
# round-5 VERDICT #5 decomposition target
CTX = int(_os.environ.get('TRAIN_ABLATE_CTX', '256'))
# attention implementation for BOTH forward and backward ('auto' = the
# XLA chain; 'pallas' = the flash kernel incl. its custom_vjp recompute
# backward — the untried N=1024 training-backward experiment)
ATTN = _os.environ.get('TRAIN_ABLATE_ATTN', 'auto')
PEAK_TFLOPS = 197.0  # v5e bf16


def build():
    from fitv2_tpu.flow.transport import create_transport
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer)

    hr = CTX > 256
    model = FiT(
        context_size=CTX, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288,
        custom_freqs='ntk-aware' if hr else 'normal',
        online_rope=hr, decouple=hr, ori_max_pe_len=16 if hr else None,
        max_cached_len=64, attn_impl=ATTN,
        use_checkpoint=(REMAT != 'none'),
        remat_policy=REMAT if REMAT != 'none' else 'full',
        dtype=jnp.bfloat16)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        mu_dtype=jnp.bfloat16))

    n_h = n_w = int(np.sqrt(CTX))
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

    def make_state():
        """Fresh device state per variant: scan_time DONATES the state
        (matching the Trainer), which consumes the previous one."""
        p = jax.jit(functools.partial(model.init, train=True))(
            {'params': rng, 'label_dropout': rng}, batch['feature'][:1],
            jnp.zeros((1,)), batch['label'][:1], batch['grid'][:1],
            batch['mask'][:1], batch['size'][:1])['params']
        if STATE_DTYPE == 'bf16':
            # NOT the production config: all-bf16 train state (halves
            # optimizer/EMA traffic, freezes the EMA — see module docstring)
            p = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
                else x, p)
        return create_train_state(p, tx)

    return model, transport, tx, make_state, batch, rng


def make_step(model, transport, tx, mode):
    """mode: full | gradonly | fwdonly."""
    import optax

    def loss_fn(params, batch, rng):
        k_transport, k_drop = jax.random.split(rng)

        def model_fn(xt, t):
            return model.apply(
                {'params': params}, xt, t, batch['label'], batch['grid'],
                batch['mask'], batch.get('size'), train=True,
                rngs={'label_dropout': k_drop})

        out = transport.training_losses(k_transport, model_fn,
                                        batch['feature'],
                                        mask=batch['mask'])
        return jnp.mean(out['loss'])

    def step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if mode == 'fwdonly':
            loss = loss_fn(state.params, batch, step_rng)
            return state.replace(step=state.step + 1), loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  step_rng)
        gn = optax.global_norm(grads)
        if mode == 'gradonly':
            return state.replace(step=state.step + 1), loss + 0.0 * gn
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from fitv2_tpu.train.train_step import update_ema
        new_ema = update_ema(state.ema_params, new_params, 0.9999)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  ema_params=new_ema, opt_state=new_opt)
        return new_state, loss + 0.0 * gn

    return step


def scan_time(step_fn, state0, batch, rng, l1=4, l2=16):
    """Donates the state into each jitted scan (the real Trainer's
    donate_argnums=(0,)) so only ONE state copy is resident — without it
    the harness holds input+output copies and OOMs the fp32 state at
    batch 16 while the actual (donating) train step fits. The evolving
    state is threaded call-to-call since donation consumes the argument."""
    def make(length):
        @functools.partial(jax.jit, donate_argnums=0)
        def run_k(state):
            def body(state, i):
                new_state, loss = step_fn(state, batch,
                                          jax.random.fold_in(rng, i))
                return new_state, loss
            state, losses = jax.lax.scan(body, state, jnp.arange(length))
            return state, losses[-1]
        return run_k

    f1, f2 = make(l1), make(l2)
    state = state0
    for f in (f1, f2):  # compile + warm
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
    return (t2 - t1) / (l2 - l1)


def main():
    variants = sys.argv[1:] or ['full', 'gradonly', 'fwdonly', 'noattn',
                                'nopre']
    print(f'backend: {jax.devices()}  batch={BATCH} ctx={CTX} '
          f'remat={REMAT} state={STATE_DTYPE} attn={ATTN}',
          flush=True)
    import fitv2_tpu.models.modules as modules
    import fitv2_tpu.ops.fused_qk_rope as fqr

    model, transport, tx, make_state, batch, rng = build()
    orig_attn = modules.masked_attention
    orig_qk = fqr.qk_norm_rope

    def attn_identity(q, k, v, mask=None, **kw):
        return v

    def qk_passthrough(q, k, cos, sin, eps=1e-6, norm_q=True, norm_k=True,
                       impl='auto'):
        return q, k

    results = {}
    for variant in variants:
        modules.masked_attention = orig_attn
        fqr.qk_norm_rope = orig_qk
        # 'full:pallas' etc. = same variant with the model's attn_impl
        # overridden (runs the flash kernel's custom_vjp recompute backward
        # in the training step -- the round-5 VERDICT #5 experiment)
        base, _, impl = variant.partition(':')
        m_v = model.clone(attn_impl=impl) if impl else model
        mode = base if base in ('gradonly', 'fwdonly') else 'full'
        if base in ('noattn', 'nopre'):
            modules.masked_attention = attn_identity
        if base == 'nopre':
            fqr.qk_norm_rope = qk_passthrough
        step_fn = make_step(m_v, transport, tx, mode)
        print(f'compiling {variant}...', flush=True)
        try:
            dt = scan_time(step_fn, make_state(), batch, rng)
        except Exception as e:
            print(f'{variant}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:160]}', flush=True)
            continue
        results[variant] = dt
        print(f'{variant:9s}: {dt*1e3:7.2f} ms/step  '
              f'{BATCH/dt:6.1f} img/s/chip', flush=True)

    modules.masked_attention = orig_attn
    fqr.qk_norm_rope = orig_qk

    from fitv2_tpu.utils.misc import flop_count_forward
    fwd_flops = flop_count_forward(1152, 36, CTX) * BATCH  # real FLOPs
    if 'full' in results:
        t = results['full']
        mfu = 3 * fwd_flops / t / (PEAK_TFLOPS * 1e12)
        print(f'\nuseful-FLOP MFU (3x fwd = {3*fwd_flops/1e12:.1f} TFLOP): '
              f'{mfu*100:.1f}%', flush=True)
    if {'full', 'gradonly'} <= results.keys():
        print(f'optimizer+EMA  : '
              f'{(results["full"]-results["gradonly"])*1e3:6.2f} ms/step',
              flush=True)
    if {'gradonly', 'fwdonly'} <= results.keys():
        print(f'backward(+rec) : '
              f'{(results["gradonly"]-results["fwdonly"])*1e3:6.2f} ms/step',
              flush=True)
    if 'fwdonly' in results:
        f = results['fwdonly']
        print(f'forward        : {f*1e3:6.2f} ms/step '
              f'({fwd_flops/f/1e12:.0f} TFLOP/s = '
              f'{fwd_flops/f/(PEAK_TFLOPS*1e10):.0f}% peak)', flush=True)
    if {'full', 'noattn'} <= results.keys():
        print(f'attention total: '
              f'{(results["full"]-results["noattn"])*1e3:6.2f} ms/step',
              flush=True)
    if {'noattn', 'nopre'} <= results.keys():
        print(f'qk-ln/rope pre : '
              f'{(results["noattn"]-results["nopre"])*1e3:6.2f} ms/step',
              flush=True)


if __name__ == '__main__':
    main()
