"""Finish the XL preempt-resume check from a surviving victim dir.

Companion to tools/train_real_e2e.py preempt: if the driving process was
killed after the victim's preemption checkpoint but before the resume run
completed, this resumes from the surviving checkpoint and compares the
post-resume loss windows against the golden trace parsed from the log.

Usage: python tools/resume_finish.py <victim_out_dir> <golden_log> [total]
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO)
except Exception:
    pass

import json
import re
import time


def main():
    victim_dir, golden_log = _sys.argv[1], _sys.argv[2]
    total = int(_sys.argv[3]) if len(_sys.argv) > 3 else 48
    golden = {}
    pat = re.compile(r'^\s+step\s+(\d+) loss ([0-9.]+) \[')
    for line in open(golden_log):
        m = pat.match(line)
        if m and '(victim)' not in line:
            golden[int(m.group(1))] = float(m.group(2))
    assert golden, f'no golden windows parsed from {golden_log}'
    print(f'golden windows: {sorted(golden)}', flush=True)

    # data shards live next to the run dirs
    data = _os.path.join(_os.path.dirname(victim_dir), 'shards')
    assert _os.path.isdir(data), data

    _sys.path.insert(0, _os.path.join(_REPO, 'tools'))
    from train_real_e2e import make_cfg, xl_model  # noqa: F401
    from fitv2_tpu.ckpt.checkpoint import latest_checkpoint_step
    from fitv2_tpu.train.trainer import Trainer
    stopped = latest_checkpoint_step(
        _os.path.join(victim_dir, 'checkpoints'))
    print(f'resuming from checkpoint step {stopped}', flush=True)
    cfg = make_cfg(data, victim_dir, batch=8, target_len=256,
                   max_steps=total, ckpt_every=10_000, log_every=4)
    windows = []

    def hook(s, m):
        windows.append((s, m))
        g = golden.get(s)
        d = (abs(m['loss'] - g) / abs(g)) if g else None
        print(f'    step {s:4d} loss {m["loss"]:.6f} golden '
              f'{g if g is not None else "-"} rel_delta '
              f'{d if d is not None else "-"} '
              f'[{time.strftime("%H:%M:%S")}]', flush=True)

    tr = Trainer(xl_model(), cfg)
    tr.train(metric_hook=hook)
    resumed = {s: m['loss'] for s, m in windows}
    common = [s for s in sorted(set(golden) & set(resumed)) if s > stopped]
    assert common, 'no post-resume windows to compare'
    # golden values parsed from the log carry 6 printed decimals -> compare
    # at that resolution
    worst = max(abs(golden[s] - resumed[s]) / max(abs(golden[s]), 1e-9)
                for s in common)
    out = {'mode': 'preempt_xl_resume_finish', 'stopped_at': int(stopped),
           'compared_windows': len(common),
           'worst_rel_loss_delta': float(worst)}
    print(json.dumps(out), flush=True)
    assert worst < 1e-3, f'loss continuity broken: {worst}'


if __name__ == '__main__':
    main()
