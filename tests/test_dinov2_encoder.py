"""DINOv2 tower numerical golden vs a torch mini-dinov2 twin.

Covers the reference's dinov2 teacher branch
(/root/reference/fit/utils/utils.py:267-300): LayerScale residuals,
cls + register tokens, learned pos embed, SwiGLU-fused FFN, torch-hub
state-dict naming (tools/gen_goldens.py _MiniDinoV2).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'dinov2.npz')


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip('dinov2.npz golden missing (run tools/gen_goldens.py)')
    return np.load(GOLDEN)


def test_patch_tokens_match_torch(golden):
    from fitv2_tpu.encoders.dinov2 import DinoV2ViT, convert_dinov2_state_dict
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith('sd:')}
    params = convert_dinov2_state_dict(sd)
    model = DinoV2ViT(img_size=28, patch_size=7, embed_dim=48, depth=3,
                      num_heads=4, num_register_tokens=2, swiglu_ffn=True)
    x = jnp.asarray(golden['x'].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = model.apply({'params': params}, x)
    np.testing.assert_allclose(np.asarray(out), golden['tokens'],
                               atol=2e-4, rtol=2e-4)


def test_pos_embed_interpolation_runs(golden):
    """a different input resolution resamples the learned pos embed."""
    from fitv2_tpu.encoders.dinov2 import DinoV2ViT, convert_dinov2_state_dict
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith('sd:')}
    params = convert_dinov2_state_dict(sd)
    model = DinoV2ViT(img_size=28, patch_size=7, embed_dim=48, depth=3,
                      num_heads=4, num_register_tokens=2, swiglu_ffn=True)
    x = jnp.zeros((1, 56, 56, 3))
    out = model.apply({'params': params}, x)
    assert out.shape == (1, 64, 48)
    assert np.all(np.isfinite(np.asarray(out)))


def test_load_encoders_dinov2_family():
    from fitv2_tpu.encoders import load_encoders
    model, params, pre = load_encoders('dinov2-vit-b')
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    tokens = model.apply({'params': params}, pre(x))
    assert tokens.shape == (1, 256, 768)
