"""Host data-path throughput: C++ native loader vs the Python assembler.

The reference feeds training through torch DataLoader worker PROCESSES
(/root/reference/train_fitv2.py:336-341); the rebuild's host path is
fitv2_tpu/data/native_loader.py (C++ thread pool: safetensors parse +
flip pick + zero-pad, native/latent_loader.cc) with a pure-Python
ThreadPoolExecutor fallback (data/latent_dataset.PrefetchLoader). Both
produce bit-identical batches (tests/test_native_loader.py); this tool
answers the PERF question: does the host path keep ahead of the chip?

Consumption rates to beat (PARITY round-4, XL-256): 72 img/s/chip at the
production fp32 state single-chip, ~110 img/s/chip pod proxy — per HOST
that is N_local_chips x that rate (4 chips/host on v5e).

Run (CPU): python tools/loader_bench.py [n_batches]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from fitv2_tpu.data.latent_dataset import (  # noqa: E402
    IN1kLatentDataset, PrefetchLoader, make_synthetic_latent_shards)

BATCH = int(os.environ.get('LOADER_BENCH_BATCH', '256'))
N_SAMPLES = int(os.environ.get('LOADER_BENCH_SAMPLES', '512'))
WORKERS = int(os.environ.get('LOADER_BENCH_WORKERS', '8'))


def run(loader) -> float:
    it = iter(loader)
    next(it)  # warm the prefetch pipeline
    n = 0
    t0 = time.perf_counter()
    for b in it:
        n += len(b['label'])
    dt = time.perf_counter() - t0
    return n / dt


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ncpu = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as root:
        # full 256-token square samples: the worst-case per-sample payload
        # (16 KB feature x flip pair + grid), reference bucket layout
        make_synthetic_latent_shards(root, n=N_SAMPLES, target_len=256,
                                     square=True)
        ds = IN1kLatentDataset(root, target_len=256)
        rng = np.random.default_rng(0)
        stream = rng.integers(N_SAMPLES, size=n_batches * BATCH)
        rates = {}
        for name, use_native in (('python', False), ('native', True)):
            loader = PrefetchLoader(ds, stream, BATCH,
                                    num_workers=WORKERS, seed=0,
                                    use_native=use_native)
            try:
                rates[name] = run(loader)
            except RuntimeError as e:  # no g++ at runtime etc.
                print(f'{name}: unavailable ({e})', flush=True)
                continue
            print(f'{name:6s}: {rates[name]:8.0f} samples/s '
                  f'({ncpu} CPU core(s), {WORKERS} workers)', flush=True)
        if len(rates) == 2:
            print(f'native/python: {rates["native"] / rates["python"]:.2f}x; '
                  f'this host config ({ncpu} core(s), {WORKERS} workers) '
                  f'covers {rates["native"] / 110:.0f} chips at the 110 '
                  f'img/s pod per-chip demand '
                  f'({rates["native"] / 72:.0f} at the 72 img/s single-chip '
                  f'fp32-state rate)', flush=True)


if __name__ == '__main__':
    main()
