"""Compiled-HLO collective assertions per parallelism strategy (VERDICT r3).

FSDP/TP/SP/PP compile and produce correct numbers on the virtual mesh, but
nothing guaranteed the partitioner inserted the *intended* collectives — a
sharding-rule regression would pass every numeric test and only show up as a
pod bill. These tests compile the real train step (train/train_step.py) on
the 8-device CPU mesh under each strategy and pin the comm signature through
fitv2_tpu.parallel.hlo_check; the broken-rule tests prove the checks fail
when a rule is deliberately removed.

Reference equivalents being pinned: grad all-reduce (DDP hooks,
/root/reference/train_fitv2.py:195-239), FSDP FULL_SHARD gather/reduce
(:225-231); TP/SP/PP have no reference counterpart (beyond-parity features).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.flow import create_transport
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.parallel.hlo_check import (
    check_dp, check_fsdp, check_pp, check_sp, check_tp, collective_counts,
)
from fitv2_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, build_mesh, fit_param_shardings, replicated,
)
from fitv2_tpu.train.train_step import (
    OptimizerConfig, TrainState, create_train_state, make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow

B, N_CTX, N_H, N_W = 8, 64, 8, 8
D_MODEL = 256


def _model():
    return FiT(context_size=N_CTX, patch_size=2, in_channels=4,
               hidden_size=D_MODEL, depth=4, num_heads=4,
               class_dropout_prob=0.1, num_classes=1000, learn_sigma=False,
               use_sit=True, use_swiglu=True, q_norm='layernorm',
               k_norm='layernorm', adaln_type='lora', adaln_lora_dim=64,
               custom_freqs='normal', max_cached_len=64, dtype=jnp.float32)


def _batch():
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    grid, mask, size = make_grid_mask_size(B, N_H, N_W, N_CTX)
    feature = jax.random.normal(jax.random.PRNGKey(0), (B, N_CTX, 16))
    label = (jnp.arange(B) % 1000).astype(jnp.int32)
    return {'feature': feature, 'grid': grid, 'mask': mask, 'label': label,
            'size': size}


@pytest.fixture(scope='module')
def setup():
    model = _model()
    batch = _batch()
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1],
        train=True)['params']
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        max_grad_norm=1.0))
    state = create_train_state(params, tx)
    return model, batch, params, transport, tx, state


def _block_weight_dims(params):
    """Non-depth dims of the scanned block's kernels (for check_fsdp)."""
    dims = []

    def visit(path, leaf):
        p = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if p.startswith('blocks/') and p.endswith('kernel'):
            dims.append(tuple(leaf.shape[1:]))  # drop the depth axis
    jax.tree_util.tree_map_with_path(visit, params)
    assert dims
    return dims


def _compile_train_step(setup, mesh_kw, constrain=True,
                        replicate_params=False):
    model, batch, params, transport, tx, state = setup
    mesh = build_mesh(MeshConfig(**mesh_kw))
    if constrain:
        model = model.clone(sequence_mesh=mesh)
    train_step = make_train_step(model, transport, tx)
    if replicate_params:
        param_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    else:
        param_sh = fit_param_shardings(mesh, params)

    def opt_sh(x):
        if not (hasattr(x, 'shape') and getattr(x, 'ndim', 0) > 0):
            return replicated(mesh)
        if replicate_params:
            return replicated(mesh)
        return fit_param_shardings(mesh, {'x': x})['x']

    state_sh = TrainState(
        step=replicated(mesh), params=param_sh, ema_params=param_sh,
        opt_state=jax.tree_util.tree_map(
            opt_sh, state.opt_state, is_leaf=lambda x: hasattr(x, 'shape')))
    bsh = batch_sharding(mesh)
    lowered = jax.jit(
        train_step,
        in_shardings=(state_sh, {k: bsh for k in batch}, replicated(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
    ).lower(state, batch, jax.random.PRNGKey(3))
    return lowered.compile().as_text()


def test_param_sharding_rules_unit(setup):
    """fit_param_shardings must put 'fsdp' on a block kernel dim and the
    Megatron 'tensor' split on qkv(out)/proj(in) — the rule layer the HLO
    tests depend on (fast regression pin for parallel/mesh._spec_for_param).
    """
    model, batch, params, *_ = setup
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    sh = fit_param_shardings(mesh, params)
    qkv = sh['blocks']['block']['attn']['qkv']['kernel'].spec
    proj = sh['blocks']['block']['attn']['proj']['kernel'].spec
    assert 'tensor' in qkv and qkv[-1] == 'tensor', qkv
    assert proj[-2] == 'tensor', proj
    assert any(s == 'fsdp' for s in qkv if s), qkv
    # scan depth axis must never be sharded (would serialize the gather)
    assert qkv[0] != 'fsdp' and qkv[0] != 'tensor', qkv


def test_dp_grad_allreduce_only(setup):
    txt = _compile_train_step(setup, dict(data=8))
    check_dp(txt)


def test_fsdp_weight_gather_pattern(setup):
    params = setup[2]
    wd = _block_weight_dims(params)
    for kw in (dict(data=1, fsdp=8), dict(data=2, fsdp=4)):
        txt = _compile_train_step(setup, kw)
        check_fsdp(txt, wd, batch=B, n_ctx=N_CTX)


def test_fsdp_broken_rules_detected(setup):
    params = setup[2]
    wd = _block_weight_dims(params)
    # broken rule 1: params replicated (the DDP layout) — no weight to
    # gather, ZeRO-3 memory claim silently void
    txt = _compile_train_step(setup, dict(data=1, fsdp=8),
                              replicate_params=True)
    with pytest.raises(AssertionError):
        check_fsdp(txt, wd, batch=B, n_ctx=N_CTX)
    # broken rule 2: no activation pin — SPMD propagation re-lays out
    # activations TP-style (full-batch activation gathers) instead of
    # gathering weights
    txt = _compile_train_step(setup, dict(data=1, fsdp=8), constrain=False)
    with pytest.raises(AssertionError):
        check_fsdp(txt, wd, batch=B, n_ctx=N_CTX)


def test_tp_row_parallel_allreduce(setup):
    txt = _compile_train_step(setup, dict(data=4, tensor=2))
    check_tp(txt, d_model=D_MODEL)
    # broken: without the column/row rules (replicated params) there is no
    # activation-shaped partial-sum all-reduce
    txt = _compile_train_step(setup, dict(data=4, tensor=2),
                              replicate_params=True)
    with pytest.raises(AssertionError):
        check_tp(txt, d_model=D_MODEL)


def test_sp_forward_token_sharded(setup):
    from jax.sharding import NamedSharding, PartitionSpec as P
    model, batch, params, *_ = setup
    mesh = build_mesh(MeshConfig(data=2, sequence=4))
    model_sp = model.clone(sequence_mesh=mesh)
    rep = NamedSharding(mesh, P())
    seq3 = NamedSharding(mesh, P('data', 'sequence', None))

    def fwd(p, f):
        return model_sp.apply({'params': p}, f, jnp.zeros((B,)),
                              batch['label'], batch['grid'], batch['mask'],
                              batch['size'])

    txt = jax.jit(fwd, in_shardings=(rep, seq3)).lower(
        params, batch['feature']).compile().as_text()
    check_sp(txt, batch=B, n_ctx=N_CTX, d_model=D_MODEL)


def test_pp_ppermute_ring(setup):
    from fitv2_tpu.parallel.pipeline import (
        make_pipelined_forward, pipeline_opt_shardings,
        pipeline_param_shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P
    model, batch, params, transport, tx, state = setup
    mesh = build_mesh(MeshConfig(data=-1, stage=4))
    pp_fwd = make_pipelined_forward(model, mesh, n_microbatches=2,
                                    train=True)
    pp_step = make_train_step(model, transport, tx, apply_fn=pp_fwd)
    param_sh = pipeline_param_shardings(mesh, params)
    rep = NamedSharding(mesh, P())
    state_sh = TrainState(step=rep, params=param_sh, ema_params=param_sh,
                          opt_state=pipeline_opt_shardings(mesh,
                                                           state.opt_state))
    bsh = {k: NamedSharding(mesh, P('data')) for k in batch}
    txt = jax.jit(pp_step, in_shardings=(state_sh, bsh, rep),
                  out_shardings=(state_sh, rep)).lower(
        state, batch, jax.random.PRNGKey(3)).compile().as_text()
    check_pp(txt)
    # the ring must live inside the microbatch schedule, not be a one-off:
    # at least one permute per schedule direction (fwd + bwd)
    assert collective_counts(txt)['collective-permute'] >= 2


# ---------------------------------------------------------------------------
# LwD / BFM family under FSDP (VERDICT r4 #3): the segment-flow train step
# has a different sharding surface than FiT (per-segment '<seg>/stack/...'
# param stacks, per-token conditioning in the sharedenc variant) — exactly
# the kind of surface the round-4 FSDP-compiled-as-TP finding proves can go
# silently wrong. Reference scale-out being matched: Accelerate DDP/FSDP in
# train_fitv2_lwd.py; segment step fit_model_lwd.py:359-416.
# ---------------------------------------------------------------------------

def _lwd_model(cls=None, **over):
    from fitv2_tpu.models.fit_lwd import FiTLwD
    cls = cls or FiTLwD
    kw = dict(context_size=N_CTX, patch_size=2, in_channels=4,
              hidden_size=D_MODEL, depth=4, num_heads=4,
              number_of_perflow=2, class_dropout_prob=0.1, num_classes=1000,
              use_swiglu=True, q_norm='layernorm', k_norm='layernorm',
              adaln_type='lora', adaln_lora_dim=64, custom_freqs='normal',
              max_cached_len=64, n_patch_h=N_H, n_patch_w=N_W,
              repa_dim=64, dtype=jnp.float32)
    kw.update(over)
    return cls(**kw)


def _lwd_batch(repa_dim=64):
    b = _batch()
    b['repa_target'] = jax.random.normal(jax.random.PRNGKey(5),
                                         (B, N_CTX, repa_dim))
    return b


def _lwd_stack_weight_dims(params):
    """Non-depth dims of every scan-stacked kernel ('<seg>/stack/...')."""
    dims = []

    def visit(path, leaf):
        p = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if '/stack/' in p and p.endswith('kernel'):
            dims.append(tuple(leaf.shape[1:]))
    jax.tree_util.tree_map_with_path(visit, params)
    assert dims
    return dims


def _compile_lwd_step(mesh_kw, cls=None, constrain=True,
                      replicate_params=False, segment_idx=0, **model_over):
    from fitv2_tpu.parallel.mesh import fit_param_shardings
    from fitv2_tpu.train.lwd_train_step import make_lwd_train_step
    mesh = build_mesh(MeshConfig(**mesh_kw))
    model = _lwd_model(cls, **model_over)
    if constrain:
        model = model.clone(sequence_mesh=mesh)
    batch = _lwd_batch()
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1])['params']
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        max_grad_norm=1.0))
    state = create_train_state(params, tx)
    step = make_lwd_train_step(model, tx)
    if replicate_params:
        param_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    else:
        param_sh = fit_param_shardings(mesh, params)

    def opt_sh(x):
        if not (hasattr(x, 'shape') and getattr(x, 'ndim', 0) > 0):
            return replicated(mesh)
        return (replicated(mesh) if replicate_params
                else fit_param_shardings(mesh, {'x': x})['x'])

    state_sh = TrainState(
        step=replicated(mesh), params=param_sh, ema_params=param_sh,
        opt_state=jax.tree_util.tree_map(
            opt_sh, state.opt_state, is_leaf=lambda x: hasattr(x, 'shape')))
    bsh = batch_sharding(mesh)
    txt = jax.jit(
        lambda s, b, r: step(s, b, r, segment_idx),
        in_shardings=(state_sh, {k: bsh for k in batch}, replicated(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
    ).lower(state, batch, jax.random.PRNGKey(3)).compile().as_text()
    return txt, params


def test_lwd_fsdp_weight_gather_pattern():
    """FSDP on the LwD segment step: per-segment stacked weights are
    gathered per layer, activations stay batch-sharded, grads reduced —
    for BOTH segments' compiled variants (each has its own param stack) and
    with the REPA representation stack in the graph."""
    for seg in (0, 1):
        txt, params = _compile_lwd_step(
            dict(data=1, fsdp=8), segment_idx=seg,
            number_of_representation_blocks=2)
        check_fsdp(txt, _lwd_stack_weight_dims(params), batch=B, n_ctx=N_CTX)


def test_lwd_fsdp_broken_rules_detected():
    # replicated params: nothing to gather — the ZeRO-3 claim is void
    txt, params = _compile_lwd_step(dict(data=1, fsdp=8),
                                    replicate_params=True)
    with pytest.raises(AssertionError):
        check_fsdp(txt, _lwd_stack_weight_dims(params), batch=B, n_ctx=N_CTX)
    # no activation pin: SPMD re-lays out activations TP-style
    txt, params = _compile_lwd_step(dict(data=1, fsdp=8), constrain=False)
    with pytest.raises(AssertionError):
        check_fsdp(txt, _lwd_stack_weight_dims(params), batch=B, n_ctx=N_CTX)


def test_lwd_sharedenc_fsdp_pattern():
    """The sharedenc/BFM variant: shared encoder stack + per-token
    conditioning (global_adaLN_modulation2 on (B,N,D) c_repre) — its
    activation surface is wider than FiT's, so the pin matters more."""
    from fitv2_tpu.models.fit_lwd_sharedenc import FiTLwDSharedEncSepDec
    txt, params = _compile_lwd_step(
        dict(data=1, fsdp=8), cls=FiTLwDSharedEncSepDec,
        number_of_representation_blocks=2)
    check_fsdp(txt, _lwd_stack_weight_dims(params), batch=B, n_ctx=N_CTX,
               max_act_gathers=4)


def test_lwd_fsdp_loss_parity_vs_single_device():
    """The fsdp8-sharded LwD step computes the same loss and grad_norm as a
    single-device run on the same seed/batch (LwDTrainer wiring end-to-end:
    sharded state + pinned activations change the schedule, not the math)."""
    from fitv2_tpu.models.fit_lwd import FiTLwD
    from fitv2_tpu.train.lwd_trainer import LwDTrainer, LwDTrainerConfig

    model = _lwd_model(number_of_representation_blocks=2)
    batch = {k: np.asarray(v) for k, v in _lwd_batch().items()}

    def run(mesh_fsdp, tmp):
        tr = LwDTrainer(model, LwDTrainerConfig(
            max_steps=2, learning_rate=1e-3, segments_per_step=2,
            log_every=1, checkpointing_steps=10_000, seed=0,
            mesh_fsdp=mesh_fsdp, output_dir=tmp))
        logs = []
        tr.train(iter([batch, batch]), resume=False,
                 metric_hook=lambda s, m: logs.append(m))
        return logs

    import tempfile
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        ref = run(1, d1)
        sh = run(8, d2)
    assert len(ref) == len(sh) == 2
    for a, b in zip(ref, sh):
        np.testing.assert_allclose(a['loss'], b['loss'], rtol=5e-4)
        np.testing.assert_allclose(a['grad_norm'], b['grad_norm'], rtol=5e-4)
