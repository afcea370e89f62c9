"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over 'stage'.

Parity oracle: the pipelined executor must reproduce model.apply exactly —
same blocks, same order, only the schedule differs. Verified for forward
and gradients on the 8-device CPU mesh (data=2 x stage=4)."""

import numpy as np

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit import FiT
from fitv2_tpu.parallel import MeshConfig, build_mesh
from fitv2_tpu.parallel.pipeline import (
    make_pipelined_forward, pipeline_param_shardings,
)


def _model(depth=8, adaln_type='lora', **kw):
    return FiT(context_size=16, patch_size=2, in_channels=4,
               hidden_size=64, depth=depth, num_heads=4, num_classes=10,
               learn_sigma=False, use_sit=True, use_swiglu=True,
               q_norm='layernorm', k_norm='layernorm', adaln_type=adaln_type,
               adaln_lora_dim=16 if adaln_type == 'lora' else None,
               max_cached_len=16, **kw)


def _batch(B=4, n_ctx=16, n_h=4, n_w=4, pad=0):
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (B, 2, n_ctx)).copy(), jnp.int32)
    mask = np.ones((B, n_ctx), np.float32)
    if pad:
        mask[:, -pad:] = 0.0
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n_ctx, 16))
    t = jnp.linspace(0.1, 0.9, B)
    y = (jnp.arange(B) % 10).astype(jnp.int32)
    size = jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]), (B, 1, 2)),
                       jnp.int32)
    return x, t, y, grid, jnp.asarray(mask), size


def _init(model, x, t, y, grid, mask, size):
    return model.init(
        {'params': jax.random.PRNGKey(1)},
        x[:1], t[:1], y[:1], grid[:1], mask[:1] if mask is not None else None,
        size[:1])['params']


def test_pp_forward_matches_reference(eight_devices):
    model = _model()
    x, t, y, grid, mask, size = _batch()
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))

    expect = model.apply({'params': params}, x, t, y, grid, mask, size)
    fwd = jax.jit(make_pipelined_forward(model, mesh, n_microbatches=2))
    with mesh:
        got = fwd(params, x, t, y, grid, mask, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_pp_forward_mask_none_and_normal_adaln(eight_devices):
    """adaln_type='normal' (no global_adaln hole) + statically-absent mask."""
    model = _model(adaln_type='normal')
    x, t, y, grid, mask, size = _batch(B=8)
    params = _init(model, x, t, y, grid, None, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))

    expect = model.apply({'params': params}, x, t, y, grid, None, size)
    fwd = jax.jit(make_pipelined_forward(model, mesh, n_microbatches=4))
    with mesh:
        got = fwd(params, x, t, y, grid, None, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_pp_padded_mask(eight_devices):
    """Padded tokens must be zeroed identically through the pipeline."""
    model = _model()
    x, t, y, grid, mask, size = _batch(pad=5)
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))

    expect = model.apply({'params': params}, x, t, y, grid, mask, size)
    fwd = jax.jit(make_pipelined_forward(model, mesh, n_microbatches=2))
    with mesh:
        got = fwd(params, x, t, y, grid, mask, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(got)[:, -5:]).max() == 0.0


def test_pp_gradients_match_reference(eight_devices):
    """The GPipe executor must be trainable: grads == non-pipelined grads
    (ppermute/scan/dynamic-update all have exact transposes)."""
    model = _model()
    x, t, y, grid, mask, size = _batch()
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))
    target = jax.random.normal(jax.random.PRNGKey(7),
                               (x.shape[0], x.shape[1], 16))

    def ref_loss(p):
        out = model.apply({'params': p}, x, t, y, grid, mask, size)
        return jnp.mean((out - target) ** 2)

    fwd = make_pipelined_forward(model, mesh, n_microbatches=2)

    def pp_loss(p):
        return jnp.mean((fwd(p, x, t, y, grid, mask, size) - target) ** 2)

    g_ref = jax.grad(ref_loss)(params)
    with mesh:
        g_pp = jax.jit(jax.grad(pp_loss))(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for k, v_ref in flat_ref:
        v_pp = flat_pp[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(v_pp), np.asarray(v_ref), rtol=2e-4, atol=1e-6,
            err_msg=f'grad mismatch at {jax.tree_util.keystr(k)}')


def test_pp_train_step_reduces_loss(eight_devices):
    """One-off pipelined training loop: loss decreases under adamw with the
    block params stage-sharded (the placement pipeline_param_shardings
    computes)."""
    import optax
    model = _model()
    x, t, y, grid, mask, size = _batch()
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))
    params = jax.device_put(params, pipeline_param_shardings(mesh, params))
    target = jax.random.normal(jax.random.PRNGKey(7),
                               (x.shape[0], x.shape[1], 16))
    fwd = make_pipelined_forward(model, mesh, n_microbatches=2)
    tx = optax.adamw(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = fwd(p, x, t, y, grid, mask, size)
            return jnp.mean((out - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pp_param_shardings(eight_devices):
    model = _model()
    x, t, y, grid, mask, size = _batch()
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))
    sh = pipeline_param_shardings(mesh, params)
    qkv = sh['blocks']['block']['attn']['qkv']['kernel']
    assert qkv.spec == jax.sharding.PartitionSpec('stage')
    assert sh['final_layer']['linear']['kernel'].spec == \
        jax.sharding.PartitionSpec()
    placed = jax.device_put(params, sh)
    leaf = placed['blocks']['block']['attn']['qkv']['kernel']
    # depth 8 split over 4 stages -> 2 blocks per stage-device shard
    assert leaf.sharding.shard_shape(leaf.shape)[0] == 2


def test_pp_composes_with_grad_accumulation(eight_devices):
    """optax.MultiSteps around the PP step: the accumulator's params-shaped
    grad buffers follow the same stage split (pipeline_opt_shardings walks
    arbitrary optimizer-state nesting by path)."""
    import optax
    from fitv2_tpu.parallel.pipeline import pipeline_opt_shardings

    model = _model()
    x, t, y, grid, mask, size = _batch()
    params = _init(model, x, t, y, grid, mask, size)
    mesh = build_mesh(MeshConfig(data=2, stage=4))
    params = jax.device_put(params, pipeline_param_shardings(mesh, params))
    tx = optax.MultiSteps(optax.adamw(3e-3), every_k_schedule=2)
    opt_state = jax.device_put(
        tx.init(params), pipeline_opt_shardings(mesh, tx.init(params)))

    # acc_grads buffer for a stacked block leaf must be stage-sharded
    acc = opt_state.acc_grads['blocks']['block']['attn']['qkv']['kernel']
    assert acc.sharding.shard_shape(acc.shape)[0] == 2  # depth 8 / 4 stages

    target = jax.random.normal(jax.random.PRNGKey(7),
                               (x.shape[0], x.shape[1], 16))
    fwd = make_pipelined_forward(model, mesh, n_microbatches=2)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((fwd(p, x, t, y, grid, mask, size) - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        p0 = params
        for _ in range(4):  # two accumulation cycles
            params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    # after 2 full cycles the params must have moved
    d = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, params, p0), 0.0)
    assert d > 0.0
