"""Inline evaluation during training: EMA preview sampling + FID.

TPU-native equivalent of the reference BFM trainer's inline eval
(/root/reference/train.py:443-520): every N steps, sample a preview batch
from the EMA weights and (optionally) compute FID/IS against a reference
activation batch — without leaving the training process.

Usage:
    hook = InlineEvalHook(model, sample_cfg, every=5000,
                          ref_images=ref_npz_path,
                          inception_weights='inception.safetensors')
    trainer.train(metric_hook=hook)  # hook also receives train metrics
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

import jax

from fitv2_tpu.sample.pipeline import SamplingConfig, build_sampler

logger = logging.getLogger('fitv2_tpu.eval_hook')


@dataclasses.dataclass
class InlineEvalHook:
    model: Any
    sample_cfg: SamplingConfig
    every: int = 5000
    n_preview: int = 16
    ref_images: Optional[str] = None          # npz with arr_0 (uint8)
    inception_weights: Optional[str] = None
    weights_are_adm: bool = False  # attest ADM TF-Inception conversion
    vae: Any = None
    vae_params: Any = None
    out_dir: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        self._evaluator = None
        self._ref_acts = None
        self._sampler = None
        self._state_ref = None  # set via attach()

    def attach(self, get_ema_params):
        """get_ema_params() -> current EMA params (called at eval time)."""
        self._get_ema = get_ema_params
        return self

    def _ensure_eval(self):
        if self._evaluator is None and self.ref_images is not None:
            from fitv2_tpu.eval.evaluator import Evaluator
            self._evaluator = Evaluator(
                self.inception_weights,
                weights_are_adm=self.weights_are_adm)
            self._ref_acts = self._evaluator.read_activations(self.ref_images)

    def __call__(self, step: int, train_metrics: Dict[str, float]) -> None:
        if step % self.every != 0:
            return
        ema = self._get_ema()
        sampler = build_sampler(self.model, ema, self.sample_cfg,
                                self.vae, self.vae_params)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        k_label, k_noise = jax.random.split(rng)
        labels = jax.random.randint(
            k_label, (self.sample_cfg.per_device_batch,), 0,
            self.sample_cfg.num_classes)
        images = np.asarray(sampler(k_noise, labels))
        if self.out_dir is not None and jax.process_index() == 0:
            os.makedirs(self.out_dir, exist_ok=True)
            np.savez(os.path.join(self.out_dir, f'preview_{step}.npz'),
                     arr_0=images)
        self._ensure_eval()
        if self._evaluator is not None and images.dtype == np.uint8:
            from fitv2_tpu.eval import statistics as stats
            acts = self._evaluator.read_activations(images)
            fid = stats.fid_from_activations(self._ref_acts['pool3'],
                                             acts['pool3'])
            is_score = stats.inception_score(acts['softmax'])
            note = ('' if self._evaluator.comparable_to_published
                    else ' [non-ADM weights: not comparable to published]')
            logger.info('inline eval step %d: fid=%.3f is=%.3f%s',
                        step, fid, is_score, note)
            train_metrics['inline_fid'] = fid
            train_metrics['inline_is'] = is_score
