"""3B TRAINING plan — the tier that cannot fit one chip, verified.

FiTv2-3B *sampling* is measured on-chip (tools/probe_3b.py); *training* it
is a pod feature: fp32 params + Adam moments + EMA alone are ~60 GB against
15.75 GB of v5e HBM. The reference trains 3B with FSDP FULL_SHARD
(/root/reference/train_fitv2.py:195-239, configs/fitv2/config_fitv2_3B.yaml)
and never states a memory plan. This tool makes the TPU plan concrete and
machine-checked, without needing a pod:

  1. compiles the REAL train step (train/train_step.py) at the full 3B
     geometry (hidden 2304 / depth 40 / heads 24 / adaln-lora 576, remat
     'dots' — configs/fitv2_3b.yaml) on a virtual 8-device mesh under
     BOTH candidate shardings — data=2 x fsdp=4 and the shipped
     data=1 x fsdp=8 — with ABSTRACT inputs (jax.eval_shape) so no
     multi-GB buffer is ever materialized;
  2. asserts the ZeRO-3 collective signature on the compiled HLO
     (per-layer weight all-gathers, bounded activation gathers, gradient
     reduction — parallel/hlo_check.check_fsdp);
  3. prints the exact per-device byte plan of the persistent train state
     (params fp32 + adam mu/nu + EMA at their true dtypes, each leaf
     divided by the shards fit_param_shardings actually gives it) for
     fsdp in {4, 8, 16, 32}, with the v5e fit verdict at 256-token (3B)
     and 1024-token (HR-3B) geometry.

Run (CPU, no chip needed): python tools/plan_3b_train.py [--hr]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Virtual 8-device CPU mesh; must precede first backend use
# (__graft_entry__.dryrun_multichip pattern: the axon sitecustomize pins
# jax_platforms via jax.config, so the env var alone is ignored).
_N_DEV = 8
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + f' --xla_force_host_platform_device_count={_N_DEV}').strip()
jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_compilation_cache_dir', None)  # CPU AOT noise
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fitv2_tpu.flow import create_transport  # noqa: E402
from fitv2_tpu.models.grid_utils import make_grid_mask_size  # noqa: E402
from fitv2_tpu.parallel.hlo_check import (  # noqa: E402
    check_fsdp, collective_counts)
from fitv2_tpu.parallel.mesh import (  # noqa: E402
    MeshConfig, batch_sharding, build_mesh, fit_param_shardings, replicated)
from fitv2_tpu.train.train_step import (  # noqa: E402
    OptimizerConfig, TrainState, create_train_state, make_optimizer,
    make_train_step)

HBM_V5E = 15.75 * 2**30  # usable HBM per v5e chip (measured round-3)


def build_3b(context_size=256, online=False):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=context_size, patch_size=2, in_channels=4,
        hidden_size=2304, depth=40, num_heads=24, class_dropout_prob=0.1,
        num_classes=1000, learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=576, use_checkpoint=True, remat_policy='dots',
        custom_freqs='ntk-aware' if online else 'normal',
        online_rope=online, decouple=online,
        ori_max_pe_len=16 if online else None,
        max_cached_len=64, dtype=jnp.bfloat16)


def abstract_state(model, n_ctx, tx):
    """Param/opt-state ShapeDtypeStructs without materializing anything."""
    def init_fn(key):
        grid, mask, size = make_grid_mask_size(1, 16, n_ctx // 16, n_ctx)
        return model.init(
            {'params': key, 'label_dropout': jax.random.PRNGKey(0)},
            jnp.zeros((1, n_ctx, 16)), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), grid, mask, size,
            train=True)['params']

    params = jax.eval_shape(init_fn, jax.random.PRNGKey(1))
    state = jax.eval_shape(lambda p: create_train_state(p, tx), params)
    return params, state


def shard_plan(params, state, fsdp_sizes, n_ctx):
    """Exact per-device persistent-state bytes per fsdp size.

    Uses the REAL rule (fit_param_shardings) on the 8-device mesh to learn
    which leaves shard and on which dim, then re-divides by each target
    shard count (checking true divisibility of that dim)."""
    mesh = build_mesh(MeshConfig(data=2, fsdp=4))
    sh = fit_param_shardings(mesh, params)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    spec_by_path = {
        jax.tree_util.keystr(p): s.spec
        for p, s in jax.tree_util.tree_leaves_with_path(
            sh, is_leaf=lambda x: hasattr(x, 'spec'))}

    def sharded_dim(path, shape):
        spec = spec_by_path[path]
        for ax, name in enumerate(spec):
            names = (name,) if isinstance(name, str) else tuple(name or ())
            if 'fsdp' in names:
                return ax
        return None

    rows = {}
    for n_shards in fsdp_sizes:
        persq = 0
        unsharded = 0
        for p, leaf in leaves:
            path = jax.tree_util.keystr(p)
            nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
            ax = sharded_dim(path, leaf.shape)
            if ax is not None and leaf.shape[ax] % n_shards == 0:
                persq += nbytes // n_shards
            else:
                persq += nbytes
                if ax is None:
                    unsharded += nbytes
        # ema/opt trees mirror the param shapes, so the byte-sharding
        # ratio measured on params applies to them exactly (ema/mu/nu are
        # fp32 like params; opt scalars like count are noise)
        def tree_bytes(tree):
            return sum(int(np.prod(l.shape)) * l.dtype.itemsize
                       for l in jax.tree_util.tree_leaves(tree)
                       if hasattr(l, 'shape') and l.shape)
        p_bytes_total = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                            for _, l in leaves)
        ratio = persq / p_bytes_total
        ema_b = tree_bytes(state.ema_params) * ratio
        opt_b = tree_bytes(state.opt_state) * ratio
        grads_b = persq  # transient but live through the optimizer update
        total = persq + ema_b + opt_b + grads_b
        rows[n_shards] = dict(
            params_gb=persq / 2**30, ema_gb=ema_b / 2**30,
            opt_gb=opt_b / 2**30, grads_gb=grads_b / 2**30,
            state_total_gb=total / 2**30,
            unsharded_mb=unsharded / 2**20,
            fits_v5e=bool(total < HBM_V5E * 0.75))  # leave 25% for acts/temps
    return rows


def compile_fsdp(model, n_ctx, batch, tx, params, state,
                 data=2, fsdp=4):
    """Compile the real train step (abstract args) under the given
    data x fsdp layout and pin the ZeRO-3 signature."""
    mesh = build_mesh(MeshConfig(data=data, fsdp=fsdp))
    model = model.clone(sequence_mesh=mesh)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    train_step = make_train_step(model, transport, tx)
    param_sh = fit_param_shardings(mesh, params)

    def opt_sh(x):
        if not (hasattr(x, 'shape') and getattr(x, 'ndim', 0) > 0):
            return replicated(mesh)
        return fit_param_shardings(mesh, {'x': x})['x']

    state_sh = TrainState(
        step=replicated(mesh), params=param_sh, ema_params=param_sh,
        opt_state=jax.tree_util.tree_map(
            opt_sh, state.opt_state, is_leaf=lambda x: hasattr(x, 'shape')))
    bsh = batch_sharding(mesh)
    grid, mask, size = make_grid_mask_size(batch, 16, n_ctx // 16, n_ctx)
    abatch = {
        'feature': jax.ShapeDtypeStruct((batch, n_ctx, 16), jnp.float32),
        'grid': jax.ShapeDtypeStruct(grid.shape, grid.dtype),
        'mask': jax.ShapeDtypeStruct(mask.shape, mask.dtype),
        'label': jax.ShapeDtypeStruct((batch,), jnp.int32),
        'size': jax.ShapeDtypeStruct(size.shape, size.dtype),
    }
    akey = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lowered = jax.jit(
        train_step,
        in_shardings=(state_sh, {k: bsh for k in abatch}, replicated(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
    ).lower(state, abatch, akey)
    compiled = lowered.compile()
    txt = compiled.as_text()
    wd = []

    def visit(p, leaf):
        path = '/'.join(str(getattr(k, 'key', k)) for k in p)
        if path.startswith('blocks/') and path.endswith('kernel'):
            wd.append(tuple(leaf.shape[1:]))
    jax.tree_util.tree_map_with_path(visit, params)
    # pure-fsdp layouts (data=1) compile 3 bounded full-activation gathers
    # at loss/embed boundaries (~19 MB each at 3B/256 — noise next to the
    # per-layer weight gathers); a broken rule shows up as dozens
    check_fsdp(txt, wd, batch=batch, n_ctx=n_ctx, max_act_gathers=4)
    counts = collective_counts(txt)
    mem = None
    try:
        ma = compiled.memory_analysis()
        mem = dict(temp_gb=ma.temp_size_in_bytes / 2**30,
                   arg_gb=ma.argument_size_in_bytes / 2**30,
                   out_gb=ma.output_size_in_bytes / 2**30)
    except Exception:
        pass
    return counts, mem


def main():
    hr = '--hr' in sys.argv
    n_ctx = 1024 if hr else 256
    batch = 8 if hr else 16
    tag = 'HR-3B/1024' if hr else '3B/256'
    model = build_3b(context_size=n_ctx, online=hr)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        max_grad_norm=1.0))
    params, state = abstract_state(model, n_ctx, tx)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f'{tag}: {n_params/1e9:.3f}B params, batch {batch}', flush=True)

    all_counts = {}
    for d, f in ((2, 4), (1, 8)):  # candidate + the shipped mesh_fsdp: 8
        print(f'compiling the real train step on data={d} x fsdp={f} '
              '(8 virtual devices, abstract inputs)...', flush=True)
        counts, mem = compile_fsdp(model, n_ctx, batch, tx, params, state,
                                   data=d, fsdp=f)
        all_counts[f'data{d}_fsdp{f}'] = {k: v for k, v in counts.items()
                                          if v}
        print(f'ZeRO-3 signature OK (data={d} x fsdp={f}):', ', '.join(
            f'{k}={v}' for k, v in counts.items() if v), flush=True)
        if mem:
            print(f'  compiled (CPU-backend) memory analysis: '
                  f'temp {mem["temp_gb"]:.2f} GB, args {mem["arg_gb"]:.2f} '
                  f'GB per device (TPU assignment differs; state plan '
                  f'below is backend-exact)', flush=True)

    rows = shard_plan(params, state, (4, 8, 16, 32), n_ctx)
    print(f'\nper-device persistent train state (params fp32 + grads + '
          f'adam mu/nu + EMA), v5e budget {HBM_V5E/2**30:.2f} GB '
          f'(fit verdict leaves 25% for activations/temps):')
    print(f'{"fsdp":>6} {"params":>8} {"grads":>8} {"opt":>8} {"ema":>8} '
          f'{"total":>8}  fits-v5e  unsharded-residue')
    for n, r in rows.items():
        print(f'{n:>6} {r["params_gb"]:>7.2f}G {r["grads_gb"]:>7.2f}G '
              f'{r["opt_gb"]:>7.2f}G {r["ema_gb"]:>7.2f}G '
              f'{r["state_total_gb"]:>7.2f}G  {str(r["fits_v5e"]):>8} '
              f'{r["unsharded_mb"]:>10.1f} MB', flush=True)
    print(json.dumps({
        'metric': f'FiTv2-{tag} train plan', 'params_b': round(n_params/1e9, 3),
        'collectives': all_counts,
        'per_device_state_gb': {str(k): round(v['state_total_gb'], 2)
                                for k, v in rows.items()},
        'min_fsdp_fits_v5e': min((k for k, v in rows.items()
                                  if v['fits_v5e']), default=None)}),
        flush=True)


if __name__ == '__main__':
    main()
