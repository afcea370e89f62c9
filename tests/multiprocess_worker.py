"""Multi-process worker driven by tests/test_multiprocess.py.

Runs as one of N localhost processes under jax.distributed.initialize on
the CPU backend (Gloo collectives) — the rebuild's equivalent of the
reference's torchrun layer (/root/reference/sample_fitv2_ddp.py:51,
train.py:489-491). Exercises every multi-host surface the single-process
virtual mesh cannot see:

  1. topology: process_count / local vs global devices
  2. per-process data sharding (data/sampler.shard_indices)
  3. one sharded train step over the GLOBAL mesh
     (jax.make_array_from_process_local_data + train/train_step.py)
  4. process_allgather of per-process sample batches (the FID gather)
  5. sync_global_devices barrier
  6. sharded orbax save of global jax.Arrays + abstract-template restore

Writes result_{pid}.json for the test to assert on. Not a pytest module
(no test_ prefix).
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=2').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', None)
    jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                               num_processes=n_proc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp

    from fitv2_tpu.data.sampler import get_train_sampler, shard_indices
    from fitv2_tpu.flow import create_transport
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.parallel.mesh import (
        MeshConfig, batch_sharding, build_mesh, process_allgather,
        replicated, sync_global_devices)
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer, make_train_step)

    results = {'pid': pid}

    # 1. topology -----------------------------------------------------------
    results['process_count'] = jax.process_count()
    results['n_local'] = len(jax.local_devices())
    results['n_global'] = len(jax.devices())

    # 2. per-process data sharding ------------------------------------------
    GB, STEPS = 8, 3
    stream = get_train_sampler(dataset_len=32, global_batch_size=GB,
                               max_steps=STEPS, resume_step=0, seed=0)
    mine = shard_indices(stream, GB, jax.process_index(), n_proc)
    results['shard'] = [int(i) for i in mine]
    results['stream_head'] = [int(i) for i in stream[:GB]]

    # 3. sharded train step on the global mesh -------------------------------
    mesh = build_mesh(MeshConfig(data=-1))  # all global devices
    model = FiT(context_size=16, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, learn_sigma=False,
                use_sit=True, use_swiglu=True, q_norm='layernorm',
                k_norm='layernorm', adaln_type='lora', adaln_lora_dim=16,
                max_cached_len=8, dtype=jnp.float32, sequence_mesh=mesh)
    B, n_ctx = GB, 16
    grid1, mask1, size1 = make_grid_mask_size(1, 4, 4, n_ctx)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        jnp.zeros((1, n_ctx, 16)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), grid1, mask1, size1,
        train=True)['params']

    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4,
                                        max_grad_norm=1.0))
    state = create_train_state(params, tx)
    train_step = make_train_step(model, transport, tx)

    # per-process local slice of the global batch, assembled into global
    # jax.Arrays (the multi-host analogue of the DDP per-rank batch)
    per = B // n_proc
    rng_np = np.random.default_rng(0)  # SAME on all procs; slice per-proc
    feat_g = rng_np.standard_normal((B, n_ctx, 16)).astype(np.float32)
    lab_g = (np.arange(B) % 10).astype(np.int32)
    gridB, maskB, sizeB = make_grid_mask_size(B, 4, 4, n_ctx)
    batch_global = {'feature': feat_g, 'label': lab_g,
                    'grid': np.asarray(gridB), 'mask': np.asarray(maskB),
                    'size': np.asarray(sizeB)}
    bsh = batch_sharding(mesh)
    lo = pid * per
    batch = {
        k: jax.make_array_from_process_local_data(
            bsh, np.ascontiguousarray(v[lo:lo + per]), v.shape)
        for k, v in batch_global.items()}

    rep = replicated(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: rep, state)
    state = jax.device_put(state, state_sh)
    rng = jax.device_put(jax.random.PRNGKey(3), rep)
    jitted = jax.jit(train_step,
                     in_shardings=(state_sh, {k: bsh for k in batch}, rep),
                     out_shardings=(state_sh, rep))
    new_state, metrics = jitted(state, batch, rng)
    results['loss'] = float(np.asarray(
        metrics['loss'].addressable_data(0)))
    results['grad_norm'] = float(np.asarray(
        metrics['grad_norm'].addressable_data(0)))
    results['step'] = int(np.asarray(new_state.step.addressable_data(0)))

    # 4. FID-style sample gather (reference train.py:489-491) ----------------
    local_samples = np.full((2, 3), pid, np.uint8)
    gathered = process_allgather(local_samples)
    results['gather_shape'] = list(gathered.shape)
    results['gather_ok'] = bool(
        all((gathered[p] == p).all() for p in range(n_proc)))

    # 5. barrier --------------------------------------------------------------
    sync_global_devices('mp_test_barrier')

    # 6. sharded orbax save of global jax.Arrays + abstract restore ----------
    # The trainers now save the sharded global state DIRECTLY (each host
    # writes its shards; no full-state allgather) and restore through a
    # sharding-carrying abstract template — this is the path that must be
    # proven on >1 process.
    from fitv2_tpu.ckpt.checkpoint import CheckpointManager
    from fitv2_tpu.train.trainer import Trainer
    ckpt_dir = os.path.join(outdir, 'ckpts')
    mgr = CheckpointManager(ckpt_dir, total_limit=2)
    # every process calls save — orbax's save is a collective (a rank0-only
    # call dies on a sync_global_devices name mismatch); orbax elects the
    # primary writer itself
    mgr.save(1, new_state)
    sync_global_devices('ckpt_saved')
    restored, found = mgr.restore(Trainer._abstract_state(new_state), step=1)
    ok = restored is not None and found == 1
    if ok:
        flat_a = jax.tree_util.tree_leaves(new_state)
        flat_b = jax.tree_util.tree_leaves(restored)
        ok = all(
            a.sharding.is_equivalent_to(b.sharding, a.ndim)
            and np.array_equal(np.asarray(a.addressable_data(0)),
                               np.asarray(b.addressable_data(0)))
            for a, b in zip(flat_a, flat_b))
    results['ckpt_roundtrip_ok'] = bool(ok)

    with open(os.path.join(outdir, f'result_{pid}.json'), 'w') as f:
        json.dump(results, f)
    print(f'worker {pid} done', flush=True)


if __name__ == '__main__':
    main()
