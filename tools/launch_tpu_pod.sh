#!/usr/bin/env bash
# Multi-host TPU-pod launcher — counterpart of the reference's torchrun
# scripts (/root/reference/tools/train_fitv2_xl.sh).
#
# On TPU pods there is no torchrun-style rendezvous launcher: every host
# runs the SAME command, `jax.distributed.initialize()` discovers the pod
# topology from the TPU metadata, and the (data, fsdp, tensor) mesh in
# fitv2_tpu/parallel/mesh.py spans all chips (DP/FSDP over ICI within a
# slice, DCN across slices). Run this via your pod-management tool, e.g.:
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="cd /path/to/repo && bash tools/launch_tpu_pod.sh \
#                  configs/fitv2_xl.yaml"
#
# The deterministic resumable sampler (fitv2_tpu/data/sampler.py) shards
# the index stream by jax.process_index(), so every host reads a disjoint
# slice and exact resume works pod-wide.

set -euo pipefail

CFG=${1:-configs/fitv2_xl.yaml}
shift || true

python - "$CFG" "$@" <<'PY'
import sys

import jax

# Pod rendezvous: no-op on a single host, TPU-metadata discovery on pods.
try:
    jax.distributed.initialize()
except Exception as e:  # single-host dev boxes
    print(f'[launch] single-process mode ({e})', file=sys.stderr)

from fitv2_tpu.cli.train import main

main(['--cfgdir', *sys.argv[1:]])
PY
