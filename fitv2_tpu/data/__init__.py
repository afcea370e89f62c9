"""Data pipeline: latent shards, resumable sampler, prefetching loaders."""

from fitv2_tpu.data.latent_dataset import (
    IN1kLatentDataset, INLatentLoader, PrefetchLoader,
    make_synthetic_latent_shards,
)
from fitv2_tpu.data.sampler import (
    batched, get_train_sampler, infinite_sampler, shard_indices,
)

__all__ = [
    'IN1kLatentDataset', 'INLatentLoader', 'PrefetchLoader',
    'make_synthetic_latent_shards', 'batched', 'get_train_sampler',
    'infinite_sampler', 'shard_indices',
]
