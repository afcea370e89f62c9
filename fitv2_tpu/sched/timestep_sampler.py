"""Importance-weighted timestep sampling for IDDPM training.

TPU-native equivalent of the reference's schedule samplers
(/root/reference/fit/scheduler/improved_diffusion/timestep_sampler.py:27-149):

  - ``UniformSampler`` — t ~ U{0..T-1}, unit importance weights.
  - ``LossSecondMomentResampler`` — keeps the ``history_per_term`` most
    recent losses per timestep and, once every term is warmed up, samples
    t with p(t) ∝ sqrt(E[loss_t²]) (mixed with a uniform floor
    ``uniform_prob``) and weights 1/(T·p[t]), which keeps the loss
    estimator unbiased while concentrating compute on high-variance
    timesteps (reference :94-149).

Design notes (TPU): sampling happens on the HOST as part of batch
construction — it is data-pipeline state, not traced computation, exactly
like the reference's torch version which lives outside the autograd graph.
The loss history is a numpy ring buffer. The reference synchronizes
per-rank losses with ``dist.all_gather`` before updating (:60-83); under
JAX each process updates from the losses of ITS OWN global-batch shard —
callers on multihost setups should gather host losses (e.g.
``multihost_utils.process_allgather``) and pass the global arrays to
``update_with_all_losses`` to reproduce that exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class ScheduleSampler:
    """Base: distribution over timesteps to reduce loss-estimator variance.

    Reference timestep_sampler.py:27-58. ``sample`` draws (t, weights)
    where E_t[weights · loss_t] equals the uniform-expectation loss.
    """

    def weights(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, batch_size: int,
               rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        w = np.asarray(self.weights(), np.float64)
        p = w / w.sum()
        t = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[t])
        return t.astype(np.int64), weights.astype(np.float32)

    def update_with_all_losses(self, ts: np.ndarray,
                               losses: np.ndarray) -> None:
        """No-op by default; resamplers record per-timestep losses."""


class UniformSampler(ScheduleSampler):
    """Reference timestep_sampler.py:43-50."""

    def __init__(self, num_timesteps: int):
        self._w = np.ones((num_timesteps,), np.float64)

    def weights(self) -> np.ndarray:
        return self._w


class LossSecondMomentResampler(ScheduleSampler):
    """Reference timestep_sampler.py:94-149."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_timesteps, history_per_term),
                                 np.float64)
        self._counts = np.zeros((num_timesteps,), np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), np.float64)
        w = np.sqrt(np.mean(self._history ** 2, axis=-1))
        w /= w.sum()
        w *= 1.0 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts: np.ndarray,
                               losses: np.ndarray) -> None:
        for t, loss in zip(np.asarray(ts).reshape(-1),
                           np.asarray(losses, np.float64).reshape(-1)):
            t = int(t)
            if self._counts[t] == self.history_per_term:
                # ring shift: drop the oldest loss (reference :137-141)
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, self._counts[t]] = loss
                self._counts[t] += 1


def create_named_schedule_sampler(name: str,
                                  num_timesteps: int) -> ScheduleSampler:
    """Reference timestep_sampler.py:14-24."""
    if name == 'uniform':
        return UniformSampler(num_timesteps)
    if name == 'loss-second-moment':
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f'unknown schedule sampler: {name}')
