"""Shape-bucketed sampling: one compiled program per (H, W) bucket.

The reference samples one resolution per DDP run (sample_fitv2_ddp.py CLI);
on TPU the idiomatic equivalent is a registry of jit specializations — one
per resolution bucket (SURVEY.md §7 step 5) — built lazily and cached, all
sharing the model params. Standard buckets cover the published evaluation
grid (README.md:53-139): 256x256 pretrain, 160x320 / 320x320 extrapolation,
512x512 / 320x640 HR.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from fitv2_tpu.models.grid_utils import pixels_to_tokens
from fitv2_tpu.sample.pipeline import SamplingConfig, build_sampler

# (height, width) -> recommended interpolation for an XL model trained at
# 16x16 patches (reference README.md:94-96, 125-139)
STANDARD_BUCKETS: Dict[Tuple[int, int], str] = {
    (256, 256): 'no',
    (160, 320): 'ntkpro2',
    (320, 320): 'ntkpro2',
    (512, 512): 'dynntk',
    (320, 640): 'dynntk',
}


@dataclasses.dataclass
class BucketedSampler:
    """Lazy per-bucket sampler cache over shared params."""
    model: object
    params: object
    base_config: SamplingConfig = SamplingConfig()
    vae: Optional[object] = None
    vae_params: Optional[object] = None
    ori_max_pe_len: int = 16

    def __post_init__(self):
        self._cache: Dict[Tuple[int, int, int, float], Callable] = {}

    def config_for(self, height: int, width: int,
                   interpolation: Optional[str] = None) -> SamplingConfig:
        interp = interpolation or STANDARD_BUCKETS.get((height, width))
        if interp is None:
            n_h, n_w = pixels_to_tokens(height, width,
                                        self.model.patch_size)
            trained = self.ori_max_pe_len
            interp = 'no' if max(n_h, n_w) <= trained else 'dynntk'
        return dataclasses.replace(
            self.base_config, image_height=height, image_width=width,
            interpolation=interp,
            ori_max_pe_len=(None if interp == 'no' else self.ori_max_pe_len),
            decouple=interp != 'no')

    def get(self, height: int, width: int,
            interpolation: Optional[str] = None) -> Callable:
        cfg = self.config_for(height, width, interpolation)
        key = (height, width, cfg.num_sampling_steps, cfg.cfg_scale)
        if key not in self._cache:
            n_h, n_w = pixels_to_tokens(height, width,
                                        self.model.patch_size)
            model = self.model
            if n_h * n_w > model.context_size:
                model = model.clone(context_size=n_h * n_w)
            self._cache[key] = build_sampler(
                model, self.params, cfg, self.vae, self.vae_params)
        return self._cache[key]

    def sample(self, rng, labels, height: int, width: int,
               interpolation: Optional[str] = None):
        return self.get(height, width, interpolation)(rng, labels)
