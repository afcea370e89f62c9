"""Sampling pipeline: bucketing, RoPE interpolation plumbing, end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size, pixels_to_tokens
from fitv2_tpu.sample import (
    SamplingConfig, apply_rope_interpolation, build_sampler,
    generate_fid_samples, save_npz,
)
from fitv2_tpu.vae import AutoencoderKL


def _model(ctx=64):
    return FiT(context_size=ctx, patch_size=2, in_channels=4,
               hidden_size=64, depth=2, num_heads=4, num_classes=10,
               learn_sigma=False, use_sit=True, use_swiglu=True,
               q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
               adaln_lora_dim=16, max_cached_len=32)


def test_pixels_to_tokens():
    assert pixels_to_tokens(256, 256, 2) == (16, 16)
    assert pixels_to_tokens(160, 320, 2) == (10, 20)


def test_make_grid_mask_size_padding():
    grid, mask, size = make_grid_mask_size(2, 3, 4, 16)
    assert grid.shape == (2, 2, 16)
    assert float(mask[0].sum()) == 12
    np.testing.assert_array_equal(np.asarray(size[0, 0]), [3, 4])
    # w index first
    np.testing.assert_array_equal(np.asarray(grid[0, 0, :4]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(grid[0, 1, :5]), [0, 0, 0, 0, 1])


def test_rope_interpolation_plumbing():
    m = _model()
    cfg = SamplingConfig(image_height=128, image_width=256,
                         interpolation='dynntk', ori_max_pe_len=4)
    m2 = apply_rope_interpolation(m, cfg)
    assert m2.custom_freqs == 'ntk-aware'
    assert m2.max_pe_len_h == 8 and m2.max_pe_len_w == 16
    assert m2.ori_max_pe_len == 4
    m3 = apply_rope_interpolation(m, SamplingConfig(interpolation='no'))
    assert m3.custom_freqs == 'normal'
    with pytest.raises(AssertionError):
        apply_rope_interpolation(m, SamplingConfig(interpolation='yarn'))


def test_sampler_latents_only():
    model = _model()
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=4, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32)
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    fn = build_sampler(model, params, cfg)
    out = fn(jax.random.PRNGKey(1), jnp.arange(2))
    assert out.shape == (2, 4, 16, 16)  # (B, C, H/8, W/8)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_with_vae_uint8(tmp_path):
    model = _model()
    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16))
    vae_params = vae.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3)))['params']
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=2, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32)
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    fn = build_sampler(model, params, cfg, vae, vae_params)
    imgs = generate_fid_samples(fn, num_fid_samples=4, per_device_batch=2,
                                num_classes=10)
    assert imgs.shape == (4, 128, 128, 3)
    assert imgs.dtype == np.uint8

    p = str(tmp_path / 'samples.npz')
    save_npz(p, imgs, num_fid_samples=3)
    loaded = np.load(p)['arr_0']
    assert loaded.shape == (3, 128, 128, 3)


def test_generate_fid_samples_resume(tmp_path):
    """resume_dir makes the FID loop preemption-safe: completed batches are
    written atomically and a restarted run loads them instead of
    re-sampling, bit-identical to an uninterrupted run (beyond reference —
    sample_fitv2_ddp.py restarts a 50K run from zero)."""
    import os

    calls = {'n': 0}

    def fake_fn(key, labels):
        calls['n'] += 1
        noise = jax.random.normal(key, (len(labels), 4, 8, 8))
        return noise + labels[:, None, None, None].astype(jnp.float32)

    rdir = str(tmp_path / 'shards')
    ref = generate_fid_samples(fake_fn, num_fid_samples=8,
                               per_device_batch=2, num_classes=10, seed=3)
    full = generate_fid_samples(fake_fn, num_fid_samples=8,
                                per_device_batch=2, num_classes=10, seed=3,
                                resume_dir=rdir)
    np.testing.assert_array_equal(full, ref)  # shards don't change output
    assert calls['n'] == 8  # 4 batches x 2 runs so far

    # simulate a preemption that lost the last two batches
    for bi in (2, 3):
        os.remove(os.path.join(rdir, f'shard_p0_b{bi}.npy'))
    resumed = generate_fid_samples(fake_fn, num_fid_samples=8,
                                   per_device_batch=2, num_classes=10,
                                   seed=3, resume_dir=rdir)
    assert calls['n'] == 10  # only the two missing batches re-sampled
    np.testing.assert_array_equal(resumed, ref)

    # a corrupt shard is regenerated, not trusted
    with open(os.path.join(rdir, 'shard_p0_b1.npy'), 'wb') as f:
        f.write(b'not an npy')
    again = generate_fid_samples(fake_fn, num_fid_samples=8,
                                 per_device_batch=2, num_classes=10,
                                 seed=3, resume_dir=rdir)
    assert calls['n'] == 11
    np.testing.assert_array_equal(again, ref)


def test_generate_fid_samples_resume_manifest_mismatch(tmp_path):
    """A rerun with a different seed/count/config against the same
    resume_dir must be REFUSED (not silently serve stale shards)."""
    def fake_fn(key, labels):
        return jax.random.normal(key, (len(labels), 4, 8, 8))
    fake_fn.config_fingerprint = 'abc123'

    rdir = str(tmp_path / 'shards')
    generate_fid_samples(fake_fn, num_fid_samples=4, per_device_batch=2,
                         num_classes=10, seed=3, resume_dir=rdir)
    # same config resumes fine
    generate_fid_samples(fake_fn, num_fid_samples=4, per_device_batch=2,
                         num_classes=10, seed=3, resume_dir=rdir)
    # changed seed: refused
    with pytest.raises(ValueError, match='manifest mismatch'):
        generate_fid_samples(fake_fn, num_fid_samples=4, per_device_batch=2,
                             num_classes=10, seed=4, resume_dir=rdir)
    # changed sampler config (fingerprint): refused
    fake_fn.config_fingerprint = 'deadbeef'
    with pytest.raises(ValueError, match='manifest mismatch'):
        generate_fid_samples(fake_fn, num_fid_samples=4, per_device_batch=2,
                             num_classes=10, seed=3, resume_dir=rdir)


def test_sampler_determinism():
    model = _model()
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=2, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32)
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    fn = build_sampler(model, params, cfg)
    a = fn(jax.random.PRNGKey(5), jnp.arange(2))
    b = fn(jax.random.PRNGKey(5), jnp.arange(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_data_parallel_8dev():
    """data_parallel=True shards the CFG batch over the 8 local devices;
    results match the single-device path on the same labels/rng."""
    model = _model()
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    cfg_dp = SamplingConfig(image_height=128, image_width=128,
                            num_sampling_steps=2, per_device_batch=1,
                            num_classes=10, dtype=jnp.float32,
                            data_parallel=True)
    fn_dp = build_sampler(model, params, cfg_dp)
    assert fn_dp.batch_size == 8 * 1
    labels = jnp.arange(8) % 10
    out_dp = fn_dp(jax.random.PRNGKey(3), labels)
    assert out_dp.shape[0] == 8

    cfg_1 = SamplingConfig(image_height=128, image_width=128,
                           num_sampling_steps=2, per_device_batch=8,
                           num_classes=10, dtype=jnp.float32)
    out_1 = build_sampler(model, params, cfg_1)(jax.random.PRNGKey(3),
                                                labels)
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_1),
                               atol=1e-5, rtol=1e-5)


def test_sampler_velocity_extrapolation_close_to_dense():
    """velocity_eval_every=2 (training-free NFE halving,
    flow/samplers.euler_sample_extrapolated) stays close to the dense-Euler
    latents on the same ladder, and closer than Euler on half the ladder
    (the same model-call budget)."""
    model = _model()
    # randomize: adaLN-zero init makes fresh models output zero velocity
    params = _randomized_params(model)

    def run(steps, every):
        cfg = SamplingConfig(image_height=128, image_width=128,
                             num_sampling_steps=steps, per_device_batch=2,
                             num_classes=10, dtype=jnp.float32,
                             velocity_eval_every=every)
        fn = build_sampler(model, params, cfg)
        return np.asarray(fn(jax.random.PRNGKey(5), jnp.arange(2)))

    dense = run(16, 1)
    extr = run(16, 2)   # 8 model calls
    half = run(8, 1)    # 8 model calls

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))

    e_extr, e_half = rel(extr, dense), rel(half, dense)
    print(f'extrapolated-vs-dense relL2 {e_extr:.3e}, half-euler {e_half:.3e}')
    assert np.isfinite(extr).all()
    assert e_extr < e_half, (e_extr, e_half)
    assert e_extr < 0.05, e_extr

    # velocity_extrap_order=2 threads through the pipeline and stays at
    # least comparably close to dense on the same budget
    cfg2 = SamplingConfig(image_height=128, image_width=128,
                          num_sampling_steps=16, per_device_batch=2,
                          num_classes=10, dtype=jnp.float32,
                          velocity_eval_every=2, velocity_extrap_order=2)
    extr2 = np.asarray(build_sampler(model, params, cfg2)(
        jax.random.PRNGKey(5), jnp.arange(2)))
    e2 = rel(extr2, dense)
    print(f'order2 extrapolated-vs-dense relL2 {e2:.3e}')
    assert np.isfinite(extr2).all()
    assert e2 < max(e_extr * 1.5, 0.05), (e2, e_extr)


def _randomized_params(model):
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, jnp.float32)
        for k, l in zip(keys, leaves)])


def test_guidance_interval_matches_reference_semantics():
    """guidance_low/high: steps outside the window run a single conditional
    forward (reference fit_model_lwd_bk.py:1332 window semantics). Checked
    against a hand-rolled python loop over the same ladder."""
    model = _model()
    params = _randomized_params(model)
    B, steps, low, high, scale = 2, 8, 0.3, 0.8, 1.5
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=steps, per_device_batch=B,
                         num_classes=10, dtype=jnp.float32, cfg_scale=scale,
                         guidance_low=low, guidance_high=high)
    fn = build_sampler(model, params, cfg)
    labels = jnp.arange(B)
    rng = jax.random.PRNGKey(5)
    got = np.asarray(fn(rng, labels))

    # manual reference loop (mirrors the pipeline's shapes/casts)
    n_ctx = 64
    grid1, _, size1 = make_grid_mask_size(B, 8, 8, n_ctx)
    grid2, _, size2 = make_grid_mask_size(2 * B, 8, 8, n_ctx)
    y2 = jnp.concatenate([labels.astype(jnp.int32),
                          jnp.full((B,), 10, jnp.int32)])
    z = jax.random.normal(rng, (B, n_ctx, 16), jnp.float32)
    sig = np.linspace(0.0, 1.0, steps + 1)
    for i in range(steps):
        t_cur, t_next = sig[i], sig[i + 1]
        if low <= t_cur <= high:
            out = model.apply({'params': params},
                              jnp.concatenate([z, z]),
                              jnp.full((2 * B,), t_cur, jnp.float32),
                              y2, grid2, None, size2)
            c, u = jnp.split(out.astype(jnp.float32), 2, axis=0)
            v = u + scale * (c - u)
        else:
            v = model.apply({'params': params}, z,
                            jnp.full((B,), t_cur, jnp.float32),
                            labels.astype(jnp.int32), grid1, None,
                            size1).astype(jnp.float32)
        z = z + (t_next - t_cur) * v
    lat = model.unpatchify(z, (16, 16), channel_last=True)[..., :4]
    want = np.asarray(jnp.transpose(lat, (0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    # full-window interval == the dense CFG path (pre/post phases empty)
    cfg_full = SamplingConfig(image_height=128, image_width=128,
                              num_sampling_steps=steps, per_device_batch=B,
                              num_classes=10, dtype=jnp.float32,
                              cfg_scale=scale,
                              guidance_low=0.0, guidance_high=0.999)
    cfg_dense = SamplingConfig(image_height=128, image_width=128,
                               num_sampling_steps=steps, per_device_batch=B,
                               num_classes=10, dtype=jnp.float32,
                               cfg_scale=scale)
    out_full = np.asarray(build_sampler(model, params, cfg_full)(rng, labels))
    out_dense = np.asarray(
        build_sampler(model, params, cfg_dense)(rng, labels))
    np.testing.assert_allclose(out_full, out_dense, atol=1e-6, rtol=1e-6)


def test_guidance_interval_rejects_trajectory():
    model = _model()
    params = _randomized_params(model)
    base = dict(image_height=128, image_width=128, num_sampling_steps=8,
                per_device_batch=1, num_classes=10, dtype=jnp.float32,
                guidance_low=0.2, guidance_high=0.8)
    with pytest.raises(ValueError, match='guidance'):
        build_sampler(model, params, SamplingConfig(**base),
                      return_trajectory=True)


def test_guidance_interval_composes_with_extrapolation():
    """Interval guidance + velocity extrapolation: each phase runs the
    extrapolated sampler on its sub-ladder (extrapolation restarts at phase
    boundaries). The composed result must stay close to the exact interval
    path — the same bound the plain extrapolation test uses."""
    model = _model()
    params = _randomized_params(model)

    def run(every):
        cfg = SamplingConfig(image_height=128, image_width=128,
                             num_sampling_steps=16, per_device_batch=2,
                             num_classes=10, dtype=jnp.float32,
                             guidance_low=0.25, guidance_high=0.75,
                             velocity_eval_every=every)
        fn = build_sampler(model, params, cfg)
        return np.asarray(fn(jax.random.PRNGKey(5), jnp.arange(2)))

    exact = run(1)
    composed = run(2)
    rel = float(np.linalg.norm(composed - exact)
                / max(np.linalg.norm(exact), 1e-9))
    assert np.isfinite(composed).all()
    assert rel < 0.05, rel


def test_extrapolation_rejects_trajectory_mode():
    """velocity_eval_every > 1 with return_trajectory=True must raise at
    build time (the extrapolated sampler does not materialize per-step
    states) instead of silently running the full-cost dense scan."""
    model = _model()
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=8, per_device_batch=1,
                         num_classes=10, dtype=jnp.float32,
                         velocity_eval_every=2)
    with pytest.raises(ValueError, match='velocity_eval_every'):
        build_sampler(model, params, cfg, return_trajectory=True)


# -- sampler_mode 'ddpm' / 'ddim' (FiTv1 improved-diffusion path,
#    reference sample_fit_ddp.py:160-183) ------------------------------------

def _fitv1_model(ctx=64):
    """FiTv1-style tiny config: epsilon + learned sigma, GELU-era adaLN
    (reference configs/fit/config_fit_xl.yaml)."""
    return FiT(context_size=ctx, patch_size=2, in_channels=4,
               hidden_size=64, depth=2, num_heads=4, num_classes=10,
               learn_sigma=True, use_sit=False, use_swiglu=True,
               adaln_type='normal', max_cached_len=32)


def _fitv1_params(model):
    grid, mask, size = make_grid_mask_size(1, 8, 8, model.context_size)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, model.context_size, 16)),
                      jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                      grid, mask, size)['params']


def test_sampler_ddpm_mode_shapes_and_finite():
    model = _fitv1_model()
    params = _fitv1_params(model)
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=4, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32,
                         sampler_mode='ddpm',
                         diffusion_config={'diffusion_steps': 40})
    fn = build_sampler(model, params, cfg)
    out = fn(jax.random.PRNGKey(1), jnp.arange(2))
    assert out.shape == (2, 4, 16, 16)  # sigma channels dropped
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_ddim_no_cfg_single_batch():
    model = _fitv1_model()
    params = _fitv1_params(model)
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=4, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32, cfg_scale=1.0,
                         sampler_mode='ddim',
                         diffusion_config={'diffusion_steps': 40})
    fn = build_sampler(model, params, cfg)
    out = fn(jax.random.PRNGKey(1), jnp.arange(2))
    assert out.shape == (2, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_ddpm_matches_direct_loop():
    """The pipeline's ddpm mode must equal running the diffusion loop by
    hand over forward_with_cfg on the same keys (wiring check: grid/mask,
    2B CFG batch, decode tail)."""
    from fitv2_tpu.models.fit import forward_with_cfg
    from fitv2_tpu.sched.gaussian_diffusion import create_diffusion

    model = _fitv1_model()
    params = _fitv1_params(model)
    B, n_ctx, steps = 2, 64, 4
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=steps, per_device_batch=B,
                         num_classes=10, dtype=jnp.float32, cfg_scale=1.5,
                         sampler_mode='ddpm',
                         diffusion_config={'diffusion_steps': 40})
    fn = build_sampler(model, params, cfg)
    rng = jax.random.PRNGKey(3)
    labels = jnp.arange(B) % 10
    got = np.asarray(fn(rng, labels))

    diffusion = create_diffusion(timestep_respacing=str(steps),
                                 diffusion_steps=40)
    grid, mask, size = make_grid_mask_size(2 * B, 8, 8, n_ctx)
    mask = None  # full grid: pipeline drops the mask statically
    y = jnp.concatenate([labels.astype(jnp.int32),
                         jnp.full((B,), 10, jnp.int32)])

    def model_fn(x, t):
        return forward_with_cfg(model, params, x.astype(jnp.float32),
                                t.astype(jnp.float32), y, grid, mask, size,
                                1.5)

    z = jax.random.normal(rng, (B, n_ctx, 16), jnp.float32)
    out = diffusion.p_sample_loop(jax.random.fold_in(rng, 1), model_fn,
                                  (2 * B, n_ctx, 16),
                                  noise=jnp.concatenate([z, z]),
                                  clip_denoised=False)[:B]
    lat = model.unpatchify(out[:, :64], (16, 16), channel_last=True)[..., :4]
    want = np.asarray(jnp.transpose(lat, (0, 3, 1, 2)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sampler_ddpm_rejects_flow_features():
    model = _fitv1_model()
    params = _fitv1_params(model)
    base = dict(image_height=128, image_width=128, num_sampling_steps=4,
                per_device_batch=1, num_classes=10, dtype=jnp.float32,
                sampler_mode='ddpm')
    with pytest.raises(ValueError, match='compose'):
        build_sampler(model, params,
                      SamplingConfig(velocity_eval_every=2, **base))
    with pytest.raises(ValueError, match='compose'):
        build_sampler(model, params,
                      SamplingConfig(guidance_low=0.3, **base))
    with pytest.raises(ValueError, match='sampler_mode'):
        build_sampler(model, params,
                      SamplingConfig(**{**base, 'sampler_mode': 'heun'}))


def test_ode_mode_rejects_learned_sigma_model():
    model = _fitv1_model()
    params = _fitv1_params(model)
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=4, per_device_batch=1,
                         num_classes=10, dtype=jnp.float32)
    with pytest.raises(ValueError, match='learn_sigma'):
        build_sampler(model, params, cfg)


@pytest.mark.slow
def test_sampler_ddpm_data_parallel_and_vae():
    """ddpm mode composes with data_parallel sharding (the 2B CFG loop
    batch under the 'data' mesh) and the VAE decode tail — equality vs the
    single-device path on the same rng/labels."""
    model = _fitv1_model()
    params = _fitv1_params(model)
    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16))
    vae_params = vae.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, 16, 3)))['params']
    base = dict(image_height=128, image_width=128, num_sampling_steps=2,
                num_classes=10, dtype=jnp.float32, sampler_mode='ddpm',
                diffusion_config={'diffusion_steps': 40})
    labels = jnp.arange(8) % 10

    fn_dp = build_sampler(model, params,
                          SamplingConfig(per_device_batch=1,
                                         data_parallel=True, **base),
                          vae, vae_params)
    assert fn_dp.batch_size == 8
    out_dp = fn_dp(jax.random.PRNGKey(3), labels)
    assert out_dp.shape == (8, 128, 128, 3) and out_dp.dtype == jnp.uint8

    fn_1 = build_sampler(model, params,
                         SamplingConfig(per_device_batch=8, **base),
                         vae, vae_params)
    out_1 = fn_1(jax.random.PRNGKey(3), labels)
    np.testing.assert_array_equal(np.asarray(out_dp), np.asarray(out_1))


def test_rope_interpolation_keep_preserves_model():
    """interpolation='keep' must leave the model's RoPE config untouched —
    the HR configs (configs/fitv2_hr_xl.yaml) already carry online decoupled
    NTK, and the default 'no' would silently reset them to cached-normal
    (the round-3 advisor finding on tools/hr_probe.py stage_composed)."""
    m = _model().clone(custom_freqs='ntk-aware', online_rope=True,
                       decouple=True, ori_max_pe_len=4)
    kept = apply_rope_interpolation(
        m, SamplingConfig(interpolation='keep'))
    assert kept is m
    reset = apply_rope_interpolation(m, SamplingConfig(interpolation='no'))
    assert reset.custom_freqs == 'normal' and not reset.online_rope


def test_sampler_quant_collections_threading():
    """build_sampler(quant_collections=...) serves exactly the passed
    calibration instead of running its own pass (bench.py relies on this to
    keep the composed serving-max config on the fidelity-measured int8
    calibration)."""
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    model = _model().clone(gemm_precision='int8')
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)['params']
    # randomize: at init the AdaLN-zero final layer makes every output
    # identically zero, which would hide whether the collections are used
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=2, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32)
    out_default = np.asarray(
        build_sampler(model, params, cfg)(jax.random.PRNGKey(1),
                                          jnp.arange(2)))

    # deliberately mis-scaled calibration (37x the recorded absmax — note
    # scaling the INPUTS would not move the scales: every quantized site
    # sits behind a LayerNorm): if the pipeline honors the passed
    # collections the output must move
    g4, m4, s4 = make_grid_mask_size(4, 8, 8, 64)
    y4 = jnp.asarray([0, 1, 10, 10], jnp.int32)
    ex = (jax.random.normal(jax.random.PRNGKey(7), (4, 64, 16)),
          jnp.full((4,), 0.5), y4, g4, m4, s4)
    calib = calibrate_quant_scales(model, params, [ex])
    coll = {'quant_calib': jax.tree_util.tree_map(lambda v: 37.0 * v, calib),
            'quant_weights': prequantize_weights(model, params, ex)}
    fn = build_sampler(model, params, cfg, quant_collections=coll)
    out_a = np.asarray(fn(jax.random.PRNGKey(1), jnp.arange(2)))
    out_b = np.asarray(fn(jax.random.PRNGKey(1), jnp.arange(2)))
    np.testing.assert_array_equal(out_a, out_b)
    assert np.isfinite(out_a).all()
    assert np.abs(out_a - out_default).max() > 0
