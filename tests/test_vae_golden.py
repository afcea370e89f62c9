"""AutoencoderKL numerical golden vs an independent torch diffusers twin.

VERDICT round-1 item #3: validates vae/autoencoder_kl.py and the
convert_vae_state_dict importer against a tiny diffusers-layout torch VAE
(tools/gen_goldens.py _TinyVAE), covering GroupNorm/attention/up-down
sampling semantics end to end. The reference loads the real SD-VAE via
diffusers (/root/reference/sample_fitv2_ddp.py:108-113).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'vae.npz')


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip('vae.npz golden missing (run tools/gen_goldens.py)')
    return np.load(GOLDEN)


@pytest.fixture(scope='module')
def model_and_params(golden):
    from fitv2_tpu.vae.autoencoder_kl import AutoencoderKL
    from fitv2_tpu.vae.torch_import import convert_vae_state_dict
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith('sd:')}
    params = convert_vae_state_dict(sd, n_levels=2, enc_layers=2,
                                    dec_layers=3)
    return AutoencoderKL(block_out_channels=(8, 16)), params


def test_encode_moments_match_torch(golden, model_and_params):
    model, params = model_and_params
    x = jnp.asarray(golden['x'].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    mean, logvar = jax.jit(
        lambda p, xx: model.apply({'params': p}, xx, method=model.encode)
    )(params, x)
    moments = np.concatenate([np.asarray(mean), np.asarray(logvar)], -1)
    want = golden['moments'].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(moments, want, rtol=1e-4, atol=1e-4)


def test_decode_matches_torch(golden, model_and_params):
    model, params = model_and_params
    z = jnp.asarray(golden['z'].transpose(0, 2, 3, 1))
    img = jax.jit(
        lambda p, zz: model.apply({'params': p}, zz, method=model.decode)
    )(params, z)
    want = golden['decoded'].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-4)
