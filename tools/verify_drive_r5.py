"""Round-5 verify drive: exercise the changed surfaces on the real chip.

Per .claude/skills/verify: small model (hidden<=128, depth<=3, ctx<=64),
flagship flows end-to-end on the TPU:
  1. Trainer on synthetic shards: steps -> checkpoint (NEW sharded-save
     path) -> fresh Trainer resumes from it -> loss continuity.
  2. SIGTERM preemption mid-train -> checkpoint at interrupted step.
  3. CFG Euler scan + pad-invariance probe.
  4. New adaptive/fixed ODE methods (dopri8/bosh3/adaptive_heun/midpoint/
     rk4) through Sampler.sample_ode on the chip.
  5. build_sampler + generate_fid_samples with resume_dir manifest
     (mismatch refused).
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO)
except Exception:
    pass

import os
import shutil
import signal
import tempfile

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print('devices:', jax.devices(), flush=True)
    tmp = tempfile.mkdtemp(prefix='verify_r5_')
    data_dir = os.path.join(tmp, 'shards')

    from fitv2_tpu.data.latent_dataset import make_synthetic_latent_shards
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.train.trainer import Trainer, TrainerConfig

    make_synthetic_latent_shards(data_dir, n=16, target_len=64, n_classes=10)
    model = FiT(context_size=64, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, learn_sigma=False,
                use_sit=True, use_swiglu=True, q_norm='layernorm',
                k_norm='layernorm', adaln_type='lora', adaln_lora_dim=16,
                max_cached_len=8, dtype=jnp.float32)
    out_dir = os.path.join(tmp, 'run')
    cfg = TrainerConfig(
        data_path=data_dir, target_len=64, global_batch_size=4,
        max_steps=6, checkpointing_steps=3, learning_rate=1e-4,
        output_dir=out_dir, num_workers=2, log_every=2,
        mixed_precision='no', handle_preemption=True)

    # 1. train 6 steps; ckpts at 3 and 6 via the NEW sharded-save path
    tr = Trainer(model, cfg)
    losses = {}
    state = tr.train(metric_hook=lambda s, m: losses.setdefault(s, m))
    print('train losses:', {k: round(v['loss'], 4) for k, v in
                            losses.items()}, flush=True)
    assert int(jax.device_get(state.step)) == 6
    from fitv2_tpu.ckpt.checkpoint import list_checkpoints
    ck = list_checkpoints(os.path.join(out_dir, 'checkpoints'))
    assert ck == [3, 6], ck
    print('1. trainer + sharded checkpoint save OK:', ck, flush=True)

    # resume: fresh Trainer restores step-6 state via abstract template
    tr2 = Trainer(model, cfg)
    state2 = tr2.train(max_steps=8)  # resumes at 6, runs to 8
    assert int(jax.device_get(state2.step)) == 8
    p6 = jax.device_get(state.params)
    flat1 = jax.tree_util.tree_leaves(jax.device_get(state2.ema_params))
    assert all(np.isfinite(x).all() for x in flat1)
    print('1b. abstract-template resume -> step 8 OK', flush=True)

    # 2. preemption: SIGTERM mid-run writes checkpoint at interrupted step
    out2 = os.path.join(tmp, 'run2')
    cfg3 = TrainerConfig(
        data_path=data_dir, target_len=64, global_batch_size=4,
        max_steps=50, checkpointing_steps=1000, learning_rate=1e-4,
        output_dir=out2, num_workers=2, log_every=1,
        mixed_precision='no', handle_preemption=True,
        preemption_sync_every=1)

    def kill_hook(step, m):
        if step == 3:
            os.kill(os.getpid(), signal.SIGTERM)
    tr3 = Trainer(model, cfg3)
    tr3.train(metric_hook=kill_hook)
    assert tr3.preempted, 'SIGTERM did not set preempted'
    ck2 = list_checkpoints(os.path.join(out2, 'checkpoints'))
    assert len(ck2) == 1 and 3 <= ck2[0] <= 5, ck2
    print('2. preemption checkpoint OK at step', ck2, flush=True)

    # 3. CFG Euler scan + pad invariance
    from fitv2_tpu.flow import cfg_model_fn, euler_sample
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    B = 2
    grid, mask, size = make_grid_mask_size(2 * B, 6, 8, 64)  # padded bucket
    y = jnp.concatenate([jnp.arange(B) % 10, jnp.full((B,), 10)]).astype(
        jnp.int32)
    params = state2.params

    def doubled(x2, t2):
        return model.apply({'params': params}, x2, t2, y, grid, mask, size)

    fn = cfg_model_fn(doubled, 1.5)
    z0 = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 16), jnp.float32)
    sig = jnp.linspace(0.0, 1.0, 9)
    samp = jax.jit(lambda z: euler_sample(fn, z, sig))
    a = jax.device_get(samp(z0))
    # mutate PADDED token features; valid outputs must be bit-identical
    z0_pad = z0.at[:, 48:, :].set(123.0)
    b = jax.device_get(samp(z0_pad))
    assert np.array_equal(a[:, :48], b[:, :48]), 'pad leaked into valid'
    print('3. CFG Euler scan + pad invariance OK', flush=True)

    # 4. new ODE methods on-chip through Sampler.sample_ode
    from fitv2_tpu.flow import Sampler, create_transport
    tr_fm = create_transport('Linear', 'velocity')
    s = Sampler(tr_fm)

    def model_fn(x, t):
        gf, mf, sf = make_grid_mask_size(x.shape[0], 8, 8, 64)
        return model.apply({'params': params}, x,
                           t.astype(jnp.float32),
                           (jnp.arange(x.shape[0]) % 10).astype(jnp.int32),
                           gf, None, sf)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 16), jnp.float32)
    for method in ('dopri5', 'dopri8', 'bosh3', 'adaptive_heun', 'midpoint',
                   'rk4', 'heun'):
        ode_fn = s.sample_ode(sampling_method=method, num_steps=6)
        out = jax.jit(lambda z, m=method: s.sample_ode(
            sampling_method=m, num_steps=6)(z, model_fn))(x0)
        out = jax.device_get(out)
        assert np.isfinite(out).all(), method
        print(f'4. ode {method:14s} OK  |x|={np.abs(out).mean():.4f}',
              flush=True)

    # 5. sampling pipeline + FID resume manifest
    from fitv2_tpu.sample import SamplingConfig, build_sampler
    from fitv2_tpu.sample.pipeline import generate_fid_samples
    scfg = SamplingConfig(image_height=128, image_width=128,
                          num_sampling_steps=4, per_device_batch=2,
                          num_classes=10, dtype=jnp.float32)
    sfn = build_sampler(model, params, scfg)
    rdir = os.path.join(tmp, 'fid_resume')
    imgs = generate_fid_samples(sfn, num_fid_samples=4, per_device_batch=2,
                                num_classes=10, seed=7, resume_dir=rdir)
    imgs2 = generate_fid_samples(sfn, num_fid_samples=4, per_device_batch=2,
                                 num_classes=10, seed=7, resume_dir=rdir)
    assert np.array_equal(imgs, imgs2)
    try:
        generate_fid_samples(sfn, num_fid_samples=4, per_device_batch=2,
                             num_classes=10, seed=8, resume_dir=rdir)
        raise SystemExit('manifest mismatch NOT refused')
    except ValueError as e:
        assert 'manifest mismatch' in str(e)
    print('5. sampling pipeline + resume manifest OK', flush=True)

    shutil.rmtree(tmp, ignore_errors=True)
    print('VERIFY DRIVE r5: ALL OK', flush=True)


if __name__ == '__main__':
    main()
