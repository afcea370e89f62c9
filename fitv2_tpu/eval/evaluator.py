"""ADM-style Evaluator facade: npz batches in, FID/sFID/IS/prec/recall out.

API-parity layer over fitv2_tpu.eval.{inception,statistics}, replacing the
reference's TF1 Evaluator (/root/reference/fit/utils/evaluator.py:81-180) and
the eval_utils helpers (compute_fid / calculate_inception_stats,
/root/reference/fit/utils/eval_utils.py:93-140).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from fitv2_tpu.eval import statistics as stats
from fitv2_tpu.eval.inception import compute_activations, load_inception

# The published FiTv2 FID numbers (README.md:54) come from the ADM suite's
# TF1 InceptionV3 graph (/root/reference/fit/utils/evaluator.py:15-23). This
# evaluator reproduces the architecture + statistics pipeline and is
# golden-tested against a pytorch-fid-layout twin, but unless
# `inception_weights` points at a converted copy of those weights, FID values
# are internally consistent (comparable across runs of THIS pipeline) yet NOT
# directly comparable to the reference's published numbers.
FID_COMPARABILITY_NOTE = (
    'FID computed with non-ADM Inception weights: comparable across this '
    'pipeline only, not to published FiTv2 numbers (pass the converted ADM '
    'TF-Inception weights for cross-paper comparability).')


class Evaluator:
    def __init__(self, inception_weights: Optional[str] = None,
                 batch_size: int = 64, weights_are_adm: bool = False):
        """``weights_are_adm`` is an explicit attestation that
        ``inception_weights`` is a converted copy of the ADM suite's TF1
        InceptionV3 weights — merely supplying SOME weights file (e.g. a
        torchvision conversion) does not make FID comparable to the
        published numbers, so comparability is never inferred from the
        path alone."""
        self.model, self.params = load_inception(inception_weights)
        self.batch_size = batch_size
        self.comparable_to_published = (inception_weights is not None
                                        and weights_are_adm)
        if not self.comparable_to_published:
            import logging
            logging.getLogger(__name__).warning(FID_COMPARABILITY_NOTE)

    def read_activations(self, images_or_npz) -> Dict[str, np.ndarray]:
        """images uint8 array or path to an npz with arr_0."""
        if isinstance(images_or_npz, str):
            images = np.load(images_or_npz)['arr_0']
        else:
            images = images_or_npz
        return compute_activations(self.model, self.params, images,
                                   self.batch_size)

    def compute_statistics(self, acts: Dict[str, np.ndarray]
                           ) -> Dict[str, np.ndarray]:
        mu, sigma = stats.activation_statistics(acts['pool3'])
        mu_s, sigma_s = stats.activation_statistics(acts['spatial'])
        return {'mu': mu, 'sigma': sigma, 'mu_s': mu_s, 'sigma_s': sigma_s}

    def compute_all(self, ref_batch, sample_batch) -> Dict[str, float]:
        ref = self.read_activations(ref_batch)
        samp = self.read_activations(sample_batch)
        return stats.compute_all_metrics(
            ref['pool3'], ref['spatial'], samp['pool3'], samp['spatial'],
            samp['softmax'])


def create_npz_from_sample_folder(sample_dir: str, num: int = 50_000
                                  ) -> str:
    """PNG folder -> ADM npz (reference eval_utils.py:73-91)."""
    from PIL import Image
    samples = []
    for i in range(num):
        img = np.asarray(Image.open(
            os.path.join(sample_dir, f'{i:06d}.png'))).astype(np.uint8)
        samples.append(img)
    arr = np.stack(samples)
    npz_path = f'{sample_dir}.npz'
    np.savez(npz_path, arr_0=arr)
    return npz_path
