"""Frozen ViT encoders: shapes, importer coverage, preprocessing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.encoders import (
    load_encoders, preprocess_raw_image, vit_base,
)
from fitv2_tpu.encoders.vit import VisionTransformer, convert_vit_state_dict


def test_vit_forward_tokens():
    model = VisionTransformer(img_size=32, patch_size=16, embed_dim=32,
                              depth=2, num_heads=2)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)['params']
    out = model.apply({'params': params}, x)
    assert out.shape == (2, 4, 32)  # 2x2 patch grid


def test_vit_importer_covers_init_tree():
    model = VisionTransformer(img_size=32, patch_size=16, embed_dim=32,
                              depth=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))['params']
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(params)}
    sd = {}
    sd['patch_embed.proj.weight'] = np.zeros((32, 3, 16, 16), np.float32)
    sd['patch_embed.proj.bias'] = np.zeros(32, np.float32)
    for i in range(2):
        sd[f'blocks.{i}.norm1.weight'] = np.ones(32, np.float32)
        sd[f'blocks.{i}.norm1.bias'] = np.zeros(32, np.float32)
        sd[f'blocks.{i}.attn.qkv.weight'] = np.zeros((96, 32), np.float32)
        sd[f'blocks.{i}.attn.qkv.bias'] = np.zeros(96, np.float32)
        sd[f'blocks.{i}.attn.proj.weight'] = np.zeros((32, 32), np.float32)
        sd[f'blocks.{i}.attn.proj.bias'] = np.zeros(32, np.float32)
        sd[f'blocks.{i}.norm2.weight'] = np.ones(32, np.float32)
        sd[f'blocks.{i}.norm2.bias'] = np.zeros(32, np.float32)
        sd[f'blocks.{i}.mlp.fc1.weight'] = np.zeros((128, 32), np.float32)
        sd[f'blocks.{i}.mlp.fc1.bias'] = np.zeros(128, np.float32)
        sd[f'blocks.{i}.mlp.fc2.weight'] = np.zeros((32, 128), np.float32)
        sd[f'blocks.{i}.mlp.fc2.bias'] = np.zeros(32, np.float32)
    sd['norm.weight'] = np.ones(32, np.float32)
    sd['norm.bias'] = np.zeros(32, np.float32)
    converted = convert_vit_state_dict(sd)
    conv_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(converted)}
    assert conv_flat == {k: v.shape for k, v in flat.items()}


def test_preprocess_families():
    x = jnp.full((1, 4, 4, 3), 255.0)
    out_in = preprocess_raw_image(x, 'dinov2-vit-b')
    out_clip = preprocess_raw_image(x, 'clip-vit-L')
    assert not np.allclose(np.asarray(out_in), np.asarray(out_clip))
    # imagenet-normalized white pixel: (1-mean)/std
    np.testing.assert_allclose(
        np.asarray(out_in)[0, 0, 0],
        (1 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5)


def test_load_encoders_random_init():
    model, params, pre = load_encoders('jepa')
    assert model.embed_dim == 768
    x = pre(jnp.zeros((1, 224, 224, 3)))
    assert x.shape == (1, 224, 224, 3)
