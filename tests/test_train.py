"""Train step: loss decreases, EMA tracks, shardings compile on 8-dev mesh."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from fitv2_tpu.flow import create_transport
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.parallel import (
    MeshConfig, batch_sharding, build_mesh, fit_param_shardings, replicated,
    shard_params,
)
from fitv2_tpu.train import (
    OptimizerConfig, create_train_state, get_scheduler, make_optimizer,
    make_train_step, update_ema,
)


def _tiny_model(n_ctx=16):
    return FiT(context_size=n_ctx, patch_size=2, in_channels=4,
               hidden_size=64, depth=2, num_heads=4, num_classes=10,
               learn_sigma=False, use_sit=True, use_swiglu=True,
               q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
               adaln_lora_dim=16, max_cached_len=16)


def _batch(B=4, n_ctx=16, n_h=4, n_w=4):
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = np.broadcast_to(grid, (B, 2, n_ctx)).copy()
    return {
        'feature': jax.random.normal(jax.random.PRNGKey(0), (B, n_ctx, 16)),
        'grid': jnp.asarray(grid, jnp.int32),
        'mask': jnp.ones((B, n_ctx), jnp.float32),
        'label': (jnp.arange(B) % 10).astype(jnp.int32),
        'size': jnp.asarray(np.broadcast_to(np.array([[4, 4]]), (B, 1, 2)),
                            jnp.int32),
    }


def _init_params(model, batch):
    return model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1],
        train=True)['params']


def test_train_step_reduces_loss():
    model = _tiny_model()
    batch = _batch()
    params = _init_params(model, batch)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=3e-3))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx))
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert int(state.step) == 30
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce loss substantially
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9


def test_ema_decay():
    p = {'w': jnp.ones((4,))}
    e = {'w': jnp.zeros((4,))}
    out = update_ema(e, p, decay=0.9)
    np.testing.assert_allclose(np.asarray(out['w']), 0.1, rtol=1e-6)


def test_ema_bf16_underflow_warns():
    """decay=0.9999 in a bf16 EMA underflows: (1-decay)*(p-ema) is below
    bf16's ~2^-8 relative precision, so the EMA freezes at init while the
    train loss converges — the failure mode that invalidated a whole probe
    run. update_ema must warn at trace time and fp32 must stay exact."""
    p = {'w': jnp.full((4,), 2.0, jnp.bfloat16)}
    e = {'w': jnp.ones((4,), jnp.bfloat16)}
    with pytest.warns(UserWarning, match='underflows'):
        out = update_ema(e, p, decay=0.9999)
    # the numerical symptom the warning is about: no movement at all
    assert np.all(np.asarray(out['w']) == np.asarray(e['w']))
    # fp32 EMA moves and no warning fires
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        out32 = update_ema({'w': jnp.ones((4,), jnp.float32)},
                           {'w': jnp.full((4,), 2.0, jnp.float32)},
                           decay=0.9999)
    np.testing.assert_allclose(np.asarray(out32['w']), 1.0001, rtol=1e-6)


def test_grad_accum_multisteps():
    model = _tiny_model()
    batch = _batch()
    params = _init_params(model, batch)
    transport = create_transport('Linear', 'velocity')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3,
                                        grad_accum_steps=2))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx))
    p0 = state.params
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    # after the first micro-step params are unchanged (accumulating)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_lr_schedules():
    import numpy as np
    sched = get_scheduler('constant_with_warmup', 1e-4, num_warmup_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 0.5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 1e-4, rtol=1e-6)

    sched = get_scheduler('cosine', 1e-4, num_warmup_steps=10,
                          num_training_steps=110)
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-10)

    sched = get_scheduler('linear', 1e-4, num_warmup_steps=10,
                          num_training_steps=110)
    np.testing.assert_allclose(float(sched(60)), 0.5e-4, rtol=1e-5)

    sched = get_scheduler('piecewise_constant', 1e-4,
                          step_rules='1:100,0.1:200,0.01')
    np.testing.assert_allclose(float(sched(50)), 1e-4)
    np.testing.assert_allclose(float(sched(150)), 1e-5)
    np.testing.assert_allclose(float(sched(250)), 1e-6)


def test_sharded_train_step_on_mesh(eight_devices):
    """DP=2 x FSDP=2 x TP=2 mesh: sharded step executes and matches shapes."""
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    model = _tiny_model()
    batch = _batch(B=8)
    params = _init_params(model, batch)
    transport = create_transport('Linear', 'velocity')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step_fn = make_train_step(model, transport, tx)

    param_sh = fit_param_shardings(mesh, params)
    # at least one leaf must actually be sharded over fsdp or tensor
    specs = [s.spec for s in jax.tree_util.tree_leaves(param_sh)]
    assert any(any(a in ('fsdp', 'tensor') for a in spec if a)
               for spec in specs), specs

    sharded_params = shard_params(mesh, params)
    bsh = batch_sharding(mesh)
    batch_sh = jax.device_put(batch, bsh)
    state = create_train_state(sharded_params, tx)

    new_state, metrics = jax.jit(step_fn)(state, batch_sh,
                                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['grad_norm']))


def test_sequence_parallel_forward(eight_devices):
    """SP: token axis sharded over the 'sequence' mesh axis. Correctness is
    validated against the replicated forward; XLA inserts the attention
    all-gathers automatically from the input shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh(MeshConfig(data=2, sequence=4))
    model = _tiny_model(n_ctx=16)
    batch = _batch(B=4)
    params = _init_params(model, batch)

    def fwd(params, feature, label, grid, mask, size):
        return model.apply({'params': params}, feature, jnp.zeros((4,)),
                           label, grid, mask, size)

    expect = fwd(params, batch['feature'], batch['label'], batch['grid'],
                 batch['mask'], batch['size'])

    seq_sh = NamedSharding(mesh, P('data', 'sequence'))
    seq3_sh = NamedSharding(mesh, P('data', 'sequence', None))
    grid_sh = NamedSharding(mesh, P('data', None, 'sequence'))
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P('data'))
    jitted = jax.jit(fwd, in_shardings=(
        rep, seq3_sh, data_sh, grid_sh, seq_sh, rep))
    args = (jax.device_put(params, rep),
            jax.device_put(batch['feature'], seq3_sh),
            jax.device_put(batch['label'], data_sh),
            jax.device_put(batch['grid'], grid_sh),
            jax.device_put(batch['mask'], seq_sh),
            jax.device_put(batch['size'], rep))
    out = jitted(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_mesh_config_resolve():
    assert MeshConfig(data=-1, fsdp=2, tensor=2).resolve(8) == (2, 1, 2, 1, 2)
    assert MeshConfig().resolve(8) == (8, 1, 1, 1, 1)
    assert MeshConfig(data=2, sequence=4).resolve(8) == (2, 1, 1, 4, 1)
    assert MeshConfig(data=2, stage=4).resolve(8) == (2, 4, 1, 1, 1)
    with pytest.raises(AssertionError):
        MeshConfig(data=3, fsdp=3, tensor=1).resolve(8)


def test_optimizer_mu_dtype_bf16():
    """Opt-in bf16 Adam first moment halves that state's HBM footprint."""
    import jax.numpy as jnp
    from fitv2_tpu.train.train_step import OptimizerConfig, make_optimizer
    params = {'w': jnp.ones((4, 4)), 'b': jnp.zeros((4,))}
    tx = make_optimizer(OptimizerConfig(mu_dtype=jnp.bfloat16))
    st = tx.init(params)
    leaves = jax.tree_util.tree_leaves(st)
    assert sum(getattr(l, 'dtype', None) == jnp.bfloat16
               for l in leaves) == 2  # mu for both params
    g = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.1), params)
    up, _ = tx.update(g, st, params)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(up))
    # default stays fp32 (reference parity) — ignore int step counters
    st32 = make_optimizer(OptimizerConfig()).init(params)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(st32)
               if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype,
                                                         jnp.floating))


def test_finetune_freeze_by_pattern():
    """make_finetune_optimizer mirrors reference FiT.finetune(type, unfreeze)
    (fit_model.py:292-300): freeze everything, then unfreeze params whose
    path contains any given substring."""
    from fitv2_tpu.train import make_finetune_optimizer

    model = _tiny_model()
    batch = _batch()
    params = _init_params(model, batch)
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    base = make_optimizer(OptimizerConfig(learning_rate=3e-3))
    tx = make_finetune_optimizer(base, unfreeze=('adaLN', 'final_layer'))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx))
    # 3 steps: adaLN fc1 grads are zero until the zero-initialized fc_out
    # kernel moves off zero (adaLN-zero init), so one step is not enough
    # for every trainable leaf to move
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    def changed(path_tuple, old, new):
        path = '/'.join(str(getattr(k, 'key', k)) for k in path_tuple)
        moved = bool(np.any(np.asarray(old) != np.asarray(new)))
        if 'adaLN' in path or 'final_layer' in path:
            return moved  # trainable: must move (nonzero grads expected)
        return not moved  # frozen: bit-identical

    flags = jax.tree_util.tree_map_with_path(
        lambda p, o, n: (p, changed(p, o, n)), params, state.params)
    bad = [p for p, ok in jax.tree_util.tree_leaves(
        flags, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
        and isinstance(x[1], bool)) if not ok]
    assert not bad, bad

    # 'full' is a no-op passthrough
    assert make_finetune_optimizer(base, ('x',), 'full') is base
