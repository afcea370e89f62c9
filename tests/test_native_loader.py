"""C++ native loader vs the Python dataset path: exact batch parity."""

import numpy as np
import pytest

from fitv2_tpu.data import IN1kLatentDataset, make_synthetic_latent_shards
from fitv2_tpu.data import native_loader


@pytest.fixture(scope='module')
def shards(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('latents'))
    make_synthetic_latent_shards(root, n=6, target_len=64, n_classes=10)
    return root


def test_native_available():
    assert native_loader.available(), native_loader._build_error


def test_tensor_shape_probe(shards):
    ds = IN1kLatentDataset(shards, target_len=64)
    path = ds.files[0][0]
    shape = native_loader.tensor_shape(path, 'feature')
    assert shape is not None and len(shape) == 4
    assert shape[0] == 2 and shape[3] == 16


def test_batch_matches_python_path(shards):
    ds = IN1kLatentDataset(shards, target_len=64)
    paths = [ds.files[i][0] for i in range(4)]
    flips = [0, 1, 0, 1]
    batch = native_loader.load_batch(paths, flips, target_len=64)
    assert batch['feature'].shape == (4, 64, 16)
    assert batch['grid'].shape == (4, 2, 64)

    # python reference assembly
    from safetensors import safe_open
    for i, (p, flip) in enumerate(zip(paths, flips)):
        with safe_open(p, framework='np') as f:
            feat = f.get_tensor('feature')[flip]
            grid = f.get_tensor('grid')
            size = f.get_tensor('size')
            label = f.get_tensor('label')
        n = grid.shape[-1]
        np.testing.assert_allclose(batch['feature'][i, :n],
                                   feat.reshape(-1, 16), rtol=1e-6)
        assert (batch['feature'][i, n:] == 0).all()
        np.testing.assert_array_equal(batch['grid'][i, :, :n], grid)
        np.testing.assert_array_equal(batch['mask'][i, :n], 1.0)
        np.testing.assert_array_equal(batch['mask'][i, n:], 0.0)
        assert batch['label'][i] == int(label)
        np.testing.assert_array_equal(batch['size'][i, 0], size)


def test_prefetch_loader_native_matches_python(shards):
    """The two PrefetchLoader backends must produce identical batches."""
    from fitv2_tpu.data import PrefetchLoader, get_train_sampler
    ds = IN1kLatentDataset(shards, target_len=64)
    stream = get_train_sampler(len(ds), 2, 4, 0, seed=9)

    def batches(use_native):
        it = PrefetchLoader(ds, stream, batch_size=2, num_workers=2,
                            seed=9, use_native=use_native)
        return list(it)

    nat = batches(True)
    py = batches(False)
    assert len(nat) == len(py) == 4
    for a, b in zip(nat, py):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=0,
                                       err_msg=k)


def test_batch_failure_reported(shards, tmp_path):
    bad = str(tmp_path / 'nope.safetensors')
    with pytest.raises(RuntimeError):
        native_loader.load_batch([bad], [0], target_len=64)


def _write_safetensors(path, tensors):
    import json
    import struct
    header = {}
    payload = b''
    for name, arr in tensors.items():
        dt = {'float32': 'F32', 'int64': 'I64', 'int32': 'I32'}[str(arr.dtype)]
        raw = arr.tobytes()
        header[name] = {'dtype': dt, 'shape': list(arr.shape),
                        'data_offsets': [len(payload), len(payload) + len(raw)]}
        payload += raw
    hj = json.dumps(header).encode()
    with open(path, 'wb') as f:
        f.write(struct.pack('<Q', len(hj)))
        f.write(hj)
        f.write(payload)


def _valid_tensors(n=16, c=16):
    return {
        'feature': np.arange(2 * n * c, dtype=np.float32).reshape(2, 4, 4, c),
        'grid': np.zeros((2, n), np.int64),
        'size': np.array([4, 4], np.int64),
        'label': np.array([3], np.int64),
    }


def test_rejects_truncated_feature_payload(tmp_path):
    """data_offsets past the shard payload must fail, not OOB-read."""
    t = _valid_tensors()
    p = str(tmp_path / 'trunc.safetensors')
    _write_safetensors(p, t)
    # truncate the file mid-feature
    data = open(p, 'rb').read()
    open(p, 'wb').write(data[:len(data) - 600])
    with pytest.raises(RuntimeError):
        native_loader.load_batch([p], [0], target_len=16)


def test_rejects_missing_flip_variant(tmp_path):
    """flip=1 against a single-variant feature stack must fail cleanly."""
    t = _valid_tensors()
    t['feature'] = t['feature'][:1]  # shape (1, 4, 4, 16)
    p = str(tmp_path / 'noflip.safetensors')
    _write_safetensors(p, t)
    with pytest.raises(RuntimeError):
        native_loader.load_batch([p], [1], target_len=16)
    # flip=0 still loads
    out = native_loader.load_batch([p], [0], target_len=16)
    assert out['feature'].shape == (1, 16, 16)


def test_rejects_overlong_grid(tmp_path):
    """a pre-padded grid longer than target_len must be rejected (it would
    overrun the caller's (2, target_len) buffer)."""
    t = _valid_tensors()
    t['grid'] = np.zeros((2, 64), np.int64)  # longer than target_len=16
    p = str(tmp_path / 'longgrid.safetensors')
    _write_safetensors(p, t)
    with pytest.raises(RuntimeError):
        native_loader.load_batch([p], [0], target_len=16)
