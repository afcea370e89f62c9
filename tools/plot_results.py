"""Analysis plots: the reference's standalone matplotlib scripts as one tool.

Ports (reference /root/reference/):
  fid-compute   plot_latency_throughput.py:7-13 — FID vs inference compute
                (GFLOPs x NFE) per method, log-x
  latency-fid   plot_time_fid.py:12-23 — batch-latency and FID bars per
                method
  difficulty    plot_difficulty.py + results.csv — per-step curves from a
                CSV (column 1 = x, remaining columns = series)

Unlike the reference scripts (hardcoded numbers only), every subcommand
also accepts a CSV so new results regenerate the same figures:
  fid-compute CSV columns: method,gflops,fid
  latency-fid CSV columns: method,latency,fid

Usage:
    python tools/plot_results.py fid-compute [--csv results.csv] [-o out.png]
    python tools/plot_results.py latency-fid [--csv results.csv] [-o out.png]
    python tools/plot_results.py difficulty --csv results.csv [-o out.png]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

# published numbers from the reference plots (plot_latency_throughput.py:7-13)
FID_COMPUTE = {
    'MDTv2-XL/2': [(259.1206 * s, f) for s, f in
                   ((12, 25.0), (24, 7.0), (48, 2.77))],
    'SiT-XL/2': [(228.92 * s, f) for s, f in
                 ((6, 12.91), (12, 4.75), (24, 2.53), (48, 1.95),
                  (96, 1.84))],
    'REPA': [(228.92 * s, f) for s, f in
             ((6, 13.0), (12, 4.21), (24, 2.37), (48, 1.89), (96, 1.75))],
    'BFM-XL/2+SF': [(215.6 * s, f) for s, f in
                    ((6, 8.01), (12, 3.28), (24, 2.14), (48, 1.76),
                     (96, 1.73))],
    'BFM-XL/2+SF+RA': [(827.03, 3.31), (1277.24, 2.26), (1684.8, 2.14),
                       (3782, 2.12)],
}

# plot_time_fid.py:12-23 (batch latency seconds, FID)
LATENCY_FID = {
    'FM': (20.38, 120.7),
    'BFM': (13.54, 124.8),
    'BFM + SF': (18.24, 98.32),
    'BFM + SF + RA': (11.33, 100.2),
}

COLORS = ['#3498DB', '#9B59B6', '#2ECC71', '#E63946', '#F77F00', '#555555']
MARKERS = ['o', '^', 's', 'D', 'P', 'v']


def _mpl():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def _read_csv(path):
    with open(path, newline='') as f:
        return list(csv.reader(f))


def plot_fid_compute(csv_path, out):
    plt = _mpl()
    data = dict(FID_COMPUTE)
    if csv_path:
        data = {}
        for method, gflops, fid in _read_csv(csv_path)[1:]:
            data.setdefault(method, []).append((float(gflops), float(fid)))
    fig, ax = plt.subplots(figsize=(8, 6))
    for i, (name, pts) in enumerate(data.items()):
        pts = sorted(pts)
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                marker=MARKERS[i % len(MARKERS)],
                color=COLORS[i % len(COLORS)], label=name, linewidth=2)
    ax.set_xscale('log')
    ax.set_xlabel('Inference compute (GFLOPs)')
    ax.set_ylabel('FID-50K')
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f'wrote {out}')


def plot_latency_fid(csv_path, out):
    plt = _mpl()
    data = dict(LATENCY_FID)
    if csv_path:
        data = {m: (float(l), float(f))
                for m, l, f in _read_csv(csv_path)[1:]}
    import numpy as np
    methods = list(data)
    x = np.arange(len(methods))
    width = 0.3
    fig, ax1 = plt.subplots(figsize=(9, 6))
    ax2 = ax1.twinx()
    ax1.bar(x - width / 2, [data[m][0] for m in methods], width,
            color='#3777af', label='Latency (s)')
    ax2.bar(x + width / 2, [data[m][1] for m in methods], width,
            color='#E63946', label='FID')
    ax1.set_xticks(x)
    ax1.set_xticklabels(methods, rotation=15)
    ax1.set_ylabel('Batch latency (s)')
    ax2.set_ylabel('FID')
    h1, l1 = ax1.get_legend_handles_labels()
    h2, l2 = ax2.get_legend_handles_labels()
    ax1.legend(h1 + h2, l1 + l2, loc='upper right')
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f'wrote {out}')


def plot_difficulty(csv_path, out):
    """Per-step curves from a results.csv (the reference ships a 10K-row
    'Step,with residual,wo residual' difficulty log)."""
    plt = _mpl()
    rows = _read_csv(csv_path)
    header, body = rows[0], rows[1:]
    xs = [float(r[0]) for r in body]
    fig, ax = plt.subplots(figsize=(8, 6))
    for i, name in enumerate(header[1:]):
        ys = [float(r[i + 1]) for r in body]
        ax.plot(xs, ys, color=COLORS[i % len(COLORS)], label=name,
                linewidth=1)
    ax.set_xlabel(header[0])
    ax.set_ylabel('value')
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f'wrote {out}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('kind', choices=['fid-compute', 'latency-fid',
                                    'difficulty'])
    p.add_argument('--csv', default=None)
    p.add_argument('-o', '--out', default=None)
    args = p.parse_args(argv)
    out = args.out or f'{args.kind.replace("-", "_")}.png'
    if args.kind == 'fid-compute':
        plot_fid_compute(args.csv, out)
    elif args.kind == 'latency-fid':
        plot_latency_fid(args.csv, out)
    else:
        if not args.csv:
            sys.exit('difficulty needs --csv')
        plot_difficulty(args.csv, out)


if __name__ == '__main__':
    main()
