"""CLIP visual tower golden vs a hand-built torch mini-CLIP (VERDICT #8).

The torch twin (tools/gen_goldens.py _MiniCLIPVisual) mirrors OpenAI
clip.model.VisionTransformer with MultiheadAttention in_proj packing,
quickGELU, class/positional embeddings, and OpenAI state-dict naming —
the reference's clip teacher branch (fit/utils/utils.py:301-320).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'clip.npz')


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip('clip.npz golden missing (run tools/gen_goldens.py)')
    return np.load(GOLDEN)


@pytest.fixture(scope='module')
def model_params(golden):
    from fitv2_tpu.encoders.clip import (
        CLIPVisionTransformer, convert_clip_visual_state_dict)
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith('sd:')}
    params = convert_clip_visual_state_dict(sd)
    model = CLIPVisionTransformer(image_size=32, patch_size=8, width=64,
                                  depth=3, num_heads=4, output_dim=48)
    return model, params


def test_tokens_and_pooled_match_torch(golden, model_params):
    model, params = model_params
    x = jnp.asarray(golden['x'].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    tokens, pooled = jax.jit(
        lambda p, xx: model.apply({'params': p}, xx))(params, x)
    np.testing.assert_allclose(np.asarray(tokens), golden['tokens'],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), golden['pooled'],
                               rtol=1e-4, atol=1e-4)


def test_forward_features_drops_class_token(golden, model_params):
    model, params = model_params
    x = jnp.asarray(golden['x'].transpose(0, 2, 3, 1))
    feats = model.apply({'params': params}, x,
                        method=model.forward_features)
    assert feats.shape == (2, 16, 64)
    np.testing.assert_allclose(np.asarray(feats), golden['tokens'][:, 1:],
                               rtol=1e-4, atol=1e-4)


def test_load_encoders_clip_family():
    from fitv2_tpu.encoders import load_encoders
    model, params, pre = load_encoders('clip')
    x = jnp.zeros((1, 32, 32, 3))
    y = pre(jnp.full((1, 8, 8, 3), 128.0))
    assert np.isfinite(np.asarray(y)).all()
    assert model.patch_size in (14, 16)
