"""Full FID pipeline on the virtual mesh: sample -> decode -> npz -> FID.

The driver-facing integration: a tiny FiT samples two batches of images
through the VAE on the 8-device CPU mesh configuration, writes the ADM npz,
and the evaluator computes FID between the generated set and itself (must
be ~0) and against noise (must be >0). Random weights — exercises plumbing,
not quality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.eval.evaluator import Evaluator
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.sample import (
    SamplingConfig, build_sampler, generate_fid_samples, save_npz,
)
from fitv2_tpu.vae import AutoencoderKL


@pytest.mark.parametrize('with_vae', [True])
def test_sample_to_fid(tmp_path, with_vae):
    model = FiT(context_size=16, patch_size=2, in_channels=4,
                hidden_size=32, depth=2, num_heads=2, num_classes=10,
                learn_sigma=False, use_sit=True, max_cached_len=8)
    grid, mask, size = make_grid_mask_size(1, 4, 4, 16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16)),
                        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                        grid, mask, size)['params']
    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16))
    vae_params = vae.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 16, 16, 3)))['params']
    cfg = SamplingConfig(image_height=64, image_width=64,
                         num_sampling_steps=2, per_device_batch=4,
                         num_classes=10, dtype=jnp.float32)
    fn = build_sampler(model, params, cfg, vae, vae_params)
    imgs = generate_fid_samples(fn, num_fid_samples=8, per_device_batch=4,
                                num_classes=10, seed=0)
    assert imgs.shape == (8, 64, 64, 3) and imgs.dtype == np.uint8

    npz = str(tmp_path / 'gen.npz')
    save_npz(npz, imgs)

    ev = Evaluator(inception_weights=None, batch_size=4)
    m_same = ev.compute_all(npz, imgs)
    assert abs(m_same['fid']) < 1e-3

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 255, imgs.shape, np.uint8).astype(np.uint8)
    m_noise = ev.compute_all(imgs, noise)
    assert m_noise['fid'] > m_same['fid']
