"""Raw-image preprocessing and folder datasets."""

import json
import os

import numpy as np
import pytest

from fitv2_tpu.data.imagenet import (
    CustomDataset, ImagenetDataset, center_crop_arr, cifar10_loader,
    create_cifar10_arrays, resize_arr,
)

PIL = pytest.importorskip('PIL')
from PIL import Image  # noqa: E402


def test_center_crop_arr():
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (600, 400, 3), np.uint8).astype(np.uint8))
    out = center_crop_arr(img, 256)
    assert out.shape == (256, 256, 3)


def test_resize_arr_quantized():
    img = Image.fromarray(np.zeros((300, 500, 3), np.uint8))
    out = resize_arr(img, max_size=256, quant=16)
    h, w, _ = out.shape
    assert max(h, w) <= 256
    assert h % 16 == 0 and w % 16 == 0


def test_imagenet_dataset(tmp_path):
    for cls in ('n01', 'n02'):
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            Image.fromarray(np.full((64, 80, 3), 100, np.uint8)).save(
                d / f'{i}.png')
    ds = ImagenetDataset(str(tmp_path), image_size=32)
    assert len(ds) == 4
    s = ds[0]
    assert s['jpg'].shape == (32, 32, 3)
    assert s['cls'] in (0, 1)


def test_custom_dataset(tmp_path):
    (tmp_path / 'images').mkdir()
    (tmp_path / 'vae-sd').mkdir()
    names = ['a.npy', 'b.npy']
    for n in names:
        np.save(tmp_path / 'images' / n, np.zeros((4, 4, 3), np.uint8))
        np.save(tmp_path / 'vae-sd' / n, np.zeros((2, 2, 4), np.float32))
    with open(tmp_path / 'images' / 'dataset.json', 'w') as f:
        json.dump({'labels': [['a.npy', 3], ['b.npy', 7]]}, f)
    ds = CustomDataset(str(tmp_path))
    assert len(ds) == 2
    img, feat, label = ds[0]
    assert img.shape == (4, 4, 3) and feat.shape == (2, 2, 4)
    assert label == 3


def _write_cifar(root):
    import pickle
    base = root / 'cifar-10-batches-py'
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        with open(base / f'data_batch_{i}', 'wb') as f:
            pickle.dump({b'data': rng.integers(0, 255, (20, 3072),
                                               np.uint8).astype(np.uint8),
                         b'labels': rng.integers(0, 10, 20).tolist()}, f)


def test_cifar10_loader(tmp_path):
    _write_cifar(tmp_path)
    images, labels = create_cifar10_arrays(str(tmp_path))
    assert images.shape == (100, 32, 32, 3)
    it = cifar10_loader(str(tmp_path), batch_size=8, seed=0)
    b = next(it)
    assert b['image'].shape == (8, 32, 32, 3)
    assert b['image'].min() >= -1.0 and b['image'].max() <= 1.0
