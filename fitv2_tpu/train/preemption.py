"""Preemption-safe exit shared by the training loops.

TPU VMs are commonly preemptible/spot; the reference only survives via its
last cadence checkpoint (train_fitv2.py:478-511). Both trainers
(train/trainer.py, train/lwd_trainer.py) install this guard: the first
SIGTERM/SIGINT sets a flag, the loop finishes its in-flight step, writes a
checkpoint at that step, and returns; a second signal exits immediately
(the original handlers are restored on the first).

Multi-process semantics: whichever host is hit, every process must enter
the collective orbax save together, so the flag is all-gathered — but only
every ``sync_every`` steps (a per-step host-blocking collective would
defeat async dispatch run-ahead). All processes evaluate the same
``step % sync_every`` cadence, keeping the collectives aligned; a
preemption is therefore acted on within sync_every steps (a few seconds),
well inside any preemption grace window.
"""

from __future__ import annotations

import logging
import signal

import numpy as np

import jax

logger = logging.getLogger('fitv2_tpu.preemption')


class PreemptionGuard:
    def __init__(self, enabled: bool = True, sync_every: int = 16):
        self.enabled = enabled
        self.sync_every = max(1, int(sync_every))
        self.sig = None
        self._installed = {}
        if not enabled:
            return
        try:
            for s in (signal.SIGTERM, signal.SIGINT):
                self._installed[s] = signal.signal(s, self._on_signal)
        except ValueError:  # not the main thread: no handlers, flag-only
            self.restore()

    def _on_signal(self, signum, frame):
        self.sig = signum
        self.restore()  # a second signal gets the original handler
        logger.warning(
            'signal %d: writing a checkpoint after the current step, then '
            'exiting (send again to exit now)', signum)

    def restore(self) -> None:
        """Put the original signal handlers back (idempotent)."""
        for s, h in list(self._installed.items()):
            try:
                signal.signal(s, h)
            except (ValueError, OSError):
                pass
        self._installed.clear()

    def should_stop(self, step: int) -> bool:
        """Poll once per train step.

        Single-process: a plain flag read. Multi-process: an aligned
        all-gather on the sync_every cadence ONLY (all processes must call
        this every step with the same step value).
        """
        if not self.enabled:
            return False
        if jax.process_count() == 1:
            return self.sig is not None
        if step % self.sync_every:
            return False
        from jax.experimental import multihost_utils
        return bool(np.any(multihost_utils.process_allgather(
            np.asarray([self.sig is not None]))))
