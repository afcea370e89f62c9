"""ImageNet VAE-latent shard dataset + prefetching host loader.

TPU-native replacement for the reference latent pipeline
(/root/reference/fit/data/in1k_latent_dataset.py:15-232):

  - Per-image safetensors files with keys
      feature: (2, h, w, 16)  — [unflipped, flipped] latent pair
      grid:    (2, N)         — token grid coordinates
      size:    (2,)           — (n_h, n_w)
      label:   ()             — int class
    stored in three bucket dirs ``from_16_to_{L}``,
    ``greater_than_{L}_resize``, ``greater_than_{L}_crop``.
  - Random resize-vs-crop source choice and pre-encoded horizontal flip.
  - Zero-pad feature/grid/mask to target_len (the XLA static shape).
  - Deterministic resumable order via fitv2_tpu.data.sampler.

The loader is host-side: a thread pool reads+pads ahead of the train step
(the TPU analogue of torch DataLoader workers — IO threads overlap with
device compute since the step is async-dispatched). Batches are numpy
dicts ready for jax.device_put onto the batch sharding.
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import os.path as osp
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from fitv2_tpu.data.sampler import batched, get_train_sampler, shard_indices


def _load_safetensors_np(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework='np') as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


class IN1kLatentDataset:
    """File discovery + one-sample padding (reference :16-70)."""

    def __init__(self, root_dir: str, target_len: int = 256,
                 random: str = 'random', flip_prob: float = 0.5):
        self.root_dir = root_dir
        self.target_len = target_len
        self.random = random
        self.flip_prob = flip_prob
        d1 = osp.join(root_dir, f'from_16_to_{target_len}')
        d2 = osp.join(root_dir, f'greater_than_{target_len}_resize')
        d3 = osp.join(root_dir, f'greater_than_{target_len}_crop')
        files_1 = set(os.listdir(d1)) if osp.isdir(d1) else set()
        files_2 = set(os.listdir(d2)) if osp.isdir(d2) else set()
        files_3 = set(os.listdir(d3)) if osp.isdir(d3) else set()
        files_23 = files_2 - files_3
        self.files: List[List[str]] = []
        self.files += [[osp.join(d1, f)] for f in sorted(files_1)]
        self.files += [[osp.join(d2, f)] for f in sorted(files_23)]
        self.files += [[osp.join(d2, f), osp.join(d3, f)]
                       for f in sorted(files_3)]
        if not self.files:
            raise FileNotFoundError(
                f'no latent shards under {root_dir} for target_len='
                f'{target_len}')

    def __len__(self) -> int:
        return len(self.files)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        choices = self.files[idx]
        if self.random == 'random':
            path = choices[int(rng.integers(len(choices)))]
        elif self.random == 'resize':
            path = choices[0]
        else:  # 'crop'
            path = choices[-1]
        data = _load_safetensors_np(path)
        L = self.target_len
        n = data['grid'].shape[-1]
        flip = int(rng.random() < self.flip_prob)
        feat_src = data['feature'][flip]  # (h, w, 16)
        feature = np.zeros((L, feat_src.shape[-1]), feat_src.dtype)
        feature[:n] = feat_src.reshape(-1, feat_src.shape[-1])
        grid = np.zeros((2, L), np.int32)
        grid[:, :n] = data['grid']
        mask = np.zeros((L,), np.float32)
        mask[:n] = 1.0
        size = np.asarray(data['size'], np.int32).reshape(1, 2)
        label = np.asarray(data['label'], np.int32).reshape(())
        return dict(feature=feature.astype(np.float32), grid=grid, mask=mask,
                    label=label, size=size)


def _collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class PrefetchLoader:
    """Prefetching batch iterator over the index stream.

    Two assembly backends:
      - native (default when buildable): the C++ thread-pool loader
        (fitv2_tpu/data/native_loader.py -> native/latent_loader.cc) does
        safetensors parse + flip + pad entirely outside Python;
      - python: a ThreadPoolExecutor over IN1kLatentDataset.get.
    Both produce identical batches for the same seed (source choice and
    flip draws use the same per-sample PCG64 streams).
    """

    def __init__(self, dataset: IN1kLatentDataset, index_stream: np.ndarray,
                 batch_size: int, num_workers: int = 8,
                 prefetch_batches: int = 4, seed: int = 0,
                 use_native: Optional[bool] = None, batch_offset: int = 0):
        self.dataset = dataset
        self.index_stream = index_stream
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch_batches
        self.seed = seed
        # global index of the first batch this loader yields: per-sample rng
        # streams are keyed (seed, GLOBAL batch index, j), so a resumed run
        # replays the exact source-choice/flip draws of the uninterrupted
        # stream — resume is bit-identical, not just index-identical
        # (reference resume replays sampler state, train_fitv2.py:394-411)
        self.batch_offset = batch_offset
        if use_native is None:
            from fitv2_tpu.data import native_loader
            use_native = native_loader.available()
        self.use_native = use_native

    def _native_batch(self, bi: int, idxs) -> Dict[str, np.ndarray]:
        from fitv2_tpu.data import native_loader
        ds = self.dataset
        paths, flips = [], []
        for j, idx in enumerate(idxs):
            rng = np.random.Generator(np.random.PCG64(
                (self.seed, self.batch_offset + bi, j)))
            choices = ds.files[idx]
            if ds.random == 'random':
                paths.append(choices[int(rng.integers(len(choices)))])
            elif ds.random == 'resize':
                paths.append(choices[0])
            else:
                paths.append(choices[-1])
            flips.append(int(rng.random() < ds.flip_prob))
        return native_loader.load_batch(paths, flips, ds.target_len,
                                        num_threads=self.num_workers)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with futures.ThreadPoolExecutor(self.num_workers) as pool:
                for bi, idxs in enumerate(batched(self.index_stream,
                                                  self.batch_size)):
                    if stop.is_set():
                        return
                    if self.use_native:
                        q.put(self._native_batch(bi, idxs))
                        continue
                    rngs = [np.random.Generator(np.random.PCG64(
                        (self.seed, self.batch_offset + bi, j)))
                        for j in range(len(idxs))]
                    samples = list(pool.map(
                        lambda a: self.dataset.get(*a), zip(idxs, rngs)))
                    q.put(_collate(samples))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class INLatentLoader:
    """Reference-API-shaped loader (in1k_latent_dataset.py:139-184)."""

    def __init__(self, data_path: str, target_len: int = 256,
                 random: str = 'random', batch_size: int = 32,
                 num_workers: int = 8):
        self.train_dataset = IN1kLatentDataset(data_path, target_len, random)
        self.batch_size = batch_size
        self.num_workers = num_workers

    def train_len(self) -> int:
        return len(self.train_dataset)

    def train_dataloader(self, global_batch_size: int, max_steps: int,
                         resume_step: int, seed: int = 42,
                         process_index: Optional[int] = None,
                         process_count: Optional[int] = None
                         ) -> PrefetchLoader:
        """Per-host loader over the deterministic resumable global stream."""
        if process_index is None:
            import jax
            process_index = jax.process_index()
            process_count = jax.process_count()
        stream = get_train_sampler(len(self.train_dataset), global_batch_size,
                                   max_steps, resume_step, seed)
        local = shard_indices(stream, global_batch_size, process_index,
                              process_count)
        per_host_batch = global_batch_size // process_count
        assert per_host_batch == self.batch_size or True  # batch_size is per-host
        return PrefetchLoader(self.train_dataset, local, per_host_batch,
                              self.num_workers, seed=seed,
                              batch_offset=resume_step)


def make_synthetic_latent_shards(root_dir: str, n: int = 16,
                                 target_len: int = 256, n_classes: int = 1000,
                                 seed: int = 0, square: bool = False) -> None:
    """Write tiny synthetic shards in the reference layout (for tests/demo).

    square=True emits full max-side square grids only (no padding) — the
    shape the LwD family trains on (it drops the padding mask, reference
    modules_lwd.py:172-175).
    """
    from safetensors.numpy import save_file
    rng = np.random.Generator(np.random.PCG64(seed))
    d1 = osp.join(root_dir, f'from_16_to_{target_len}')
    os.makedirs(d1, exist_ok=True)
    for i in range(n):
        max_side = int(np.sqrt(target_len))
        if square:
            h = w = max_side
        else:
            h = int(rng.integers(2, max_side + 1))
            w = int(rng.integers(2, max_side + 1))
        gw, gh = np.meshgrid(np.arange(w), np.arange(h))
        grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0).astype(np.int32)
        save_file({
            'feature': rng.standard_normal((2, h, w, 16)).astype(np.float32),
            'grid': grid,
            'size': np.array([h, w], np.int32),
            'label': np.array(int(rng.integers(n_classes)), np.int32),
        }, osp.join(d1, f'{i:06d}.safetensors'))
