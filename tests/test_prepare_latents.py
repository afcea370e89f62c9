"""Dataset-prep round trip: images -> tools/prepare_latents -> loader ->
train step (round-4 VERDICT #6).

The prep tool is the rebuild's only path to the reference latent layout
(the reference ships pre-encoded downloads, in1k_latent_dataset.py:44-69);
these tests pin its feature/grid/size/label/flip conventions to what
IN1kLatentDataset and the model's unpatchify actually consume, across all
THREE bucket dirs.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.data.latent_dataset import IN1kLatentDataset, PrefetchLoader
from fitv2_tpu.vae import AutoencoderKL

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            'tools'))
from prepare_latents import (  # noqa: E402
    patchify_latent, prepare_latents, quantized_native_tokens)

TARGET_LEN = 16          # max_side = 4 tokens * 16 px = 64 px
PATCH = 2


@pytest.fixture(scope='module')
def tiny_vae():
    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16))
    params = vae.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)))['params']

    def encode(x):
        mean, _ = vae.apply({'params': params}, jnp.asarray(x),
                            method=vae.encode)
        return np.asarray(mean * 0.18215)
    return vae, params, encode


@pytest.fixture(scope='module')
def prepared(tmp_path_factory, tiny_vae):
    from PIL import Image
    _, _, encode = tiny_vae
    root = tmp_path_factory.mktemp('imgs')
    out = tmp_path_factory.mktemp('latents')
    rng = np.random.default_rng(0)
    # class 0: one SMALL image (48x32 px -> 3x2=6 native tokens <= 16)
    os.makedirs(root / 'class_a')
    Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8)).save(
        root / 'class_a' / 'small.png')
    # class 1: one LARGE image (200x180 -> 12*11=132 tokens > 16)
    os.makedirs(root / 'class_b')
    Image.fromarray(rng.integers(0, 255, (180, 200, 3), np.uint8)).save(
        root / 'class_b' / 'large.png')
    counts = prepare_latents(str(root), encode, str(out),
                             target_len=TARGET_LEN, patch_size=PATCH,
                             log_every=0)
    return str(root), str(out), counts


def test_bucket_routing(prepared):
    _, out, counts = prepared
    assert counts == {'small': 1, 'large': 1}
    small = sorted(os.listdir(osp.join(out, f'from_16_to_{TARGET_LEN}')))
    res = sorted(os.listdir(osp.join(out, f'greater_than_{TARGET_LEN}_resize')))
    crop = sorted(os.listdir(osp.join(out, f'greater_than_{TARGET_LEN}_crop')))
    assert len(small) == 1 and len(res) == 1
    assert res == crop  # same filename -> loader pairs them (latent_dataset.py:65)


def test_quantized_native_tokens():
    assert quantized_native_tokens(48, 32) == 6
    assert quantized_native_tokens(200, 180) == 132
    assert quantized_native_tokens(15, 15) == 1  # floors clamp at 1


def test_loader_reads_prepared_shards(prepared):
    _, out, _ = prepared
    ds = IN1kLatentDataset(out, target_len=TARGET_LEN, random='random')
    assert len(ds) == 2
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        s = ds.get(i, rng)
        assert s['feature'].shape == (TARGET_LEN, PATCH * PATCH * 4)
        assert s['grid'].shape == (2, TARGET_LEN)
        assert s['mask'].shape == (TARGET_LEN,)
        assert s['size'].shape == (1, 2)
        n = int(s['mask'].sum())
        assert n == s['size'][0, 0] * s['size'][0, 1]
        # grid is W-index-first and zero-padded past n
        assert (s['grid'][:, n:] == 0).all()
        assert s['label'] in (0, 1)


def test_feature_matches_unpatchify_and_flip(prepared, tiny_vae):
    """Shard feature[k] patchification must invert FiT.unpatchify, and
    feature[1] must be the encode of the horizontally flipped image."""
    from PIL import Image
    from fitv2_tpu.data.imagenet import resize_arr
    from fitv2_tpu.models.fit import FiT
    root, out, _ = prepared
    _, _, encode = tiny_vae
    from safetensors import safe_open
    path = osp.join(out, f'from_16_to_{TARGET_LEN}', '000000.safetensors')
    with safe_open(path, framework='np') as f:
        feat = f.get_tensor('feature')       # (2, gh, gw, 16)
        size = f.get_tensor('size')
    gh, gw = int(size[0]), int(size[1])

    pil = Image.open(osp.join(root, 'class_a', 'small.png')).convert('RGB')
    arr = resize_arr(pil, max_size=max(pil.size)).astype(np.float32)
    img = arr / 127.5 - 1.0
    both = np.stack([img, img[:, ::-1]])
    mean = encode(both)                       # (2, lh, lw, 4)
    np.testing.assert_allclose(feat, patchify_latent(mean, PATCH),
                               rtol=1e-5, atol=1e-6)

    # unpatchify inverts the token layout back to the latent grid
    model = FiT(context_size=TARGET_LEN, patch_size=PATCH, in_channels=4,
                hidden_size=32, depth=1, num_heads=2, num_classes=2,
                learn_sigma=False, use_sit=True, max_cached_len=8)
    tokens = jnp.asarray(feat[0].reshape(1, gh * gw, -1))
    rec = model.unpatchify(tokens, (gh * PATCH, gw * PATCH),
                           channel_last=True)
    np.testing.assert_allclose(np.asarray(rec)[0], mean[0],
                               rtol=1e-5, atol=1e-6)

    # the loader's flip pick (flip_prob=1) serves exactly feature[1]
    ds = IN1kLatentDataset(out, target_len=TARGET_LEN, random='resize',
                           flip_prob=1.0)
    idx = [i for i in range(len(ds)) if 'from_16' in ds.files[i][0]][0]
    s = ds.get(idx, np.random.default_rng(0))
    np.testing.assert_allclose(
        s['feature'][:gh * gw],
        patchify_latent(mean, PATCH)[1].reshape(gh * gw, -1),
        rtol=1e-5, atol=1e-6)


def test_prepared_shards_drive_one_train_step(prepared):
    """The full loop: prep shards -> PrefetchLoader batch -> jitted train
    step (the reference's operating mode, train_fitv2.py:430-459)."""
    from fitv2_tpu.flow import create_transport
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer, make_train_step)
    _, out, _ = prepared
    ds = IN1kLatentDataset(out, target_len=TARGET_LEN, random='random')
    stream = np.array([0, 1, 0, 1])
    loader = PrefetchLoader(ds, stream, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch['feature'].shape == (2, TARGET_LEN, 16)

    model = FiT(context_size=TARGET_LEN, patch_size=PATCH, in_channels=4,
                hidden_size=32, depth=1, num_heads=2, num_classes=2,
                learn_sigma=False, use_sit=True, use_swiglu=True,
                adaln_type='lora', adaln_lora_dim=8, max_cached_len=8,
                dtype=jnp.float32)
    params = model.init(
        {'params': jax.random.PRNGKey(0),
         'label_dropout': jax.random.PRNGKey(1)},
        jnp.asarray(batch['feature'][:1]), jnp.zeros((1,)),
        jnp.asarray(batch['label'][:1]), jnp.asarray(batch['grid'][:1]),
        jnp.asarray(batch['mask'][:1]), jnp.asarray(batch['size'][:1]),
        train=True)['params']
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-4))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, transport, tx))
    new_state, metrics = step(
        state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == 1
