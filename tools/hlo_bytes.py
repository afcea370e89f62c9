"""Byte-account an optimized HLO dump (from tools/dump_hlo.py): for the
block-scan while-body, list every top-level instruction with its output
bytes, bucketed by category, so HBM-traffic hot spots and fusion boundaries
are visible without the (stale-prone) remote profiler.

Usage: python tools/hlo_bytes.py /tmp/hlo_int8_b8.txt [min_mbytes]
Pure text analysis — no JAX, safe to run anywhere.
"""

import re
import sys

DT_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4, 's8': 1,
            'u8': 1, 'pred': 1, 's64': 8, 'u64': 8, 'f64': 8, 's16': 2,
            'u16': 2}


def shape_bytes(shape_str):
    """'bf16[16,256,3456]{...}' -> bytes; tuples '(a, b)' -> sum."""
    total = 0
    for m in re.finditer(r'(\w+)\[([\d,]*)\]', shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main():
    path = sys.argv[1]
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    txt = open(path).read()

    # find the biggest while-body computation (the 36-block scan)
    # split into computations: each starts at column 0 with '%name (' or
    # 'ENTRY %name (' and ends at a column-0 '}'
    comps = {}
    cur_name, cur_lines = None, []
    for line in txt.splitlines():
        m = re.match(r'(?:ENTRY )?%([\w.\-]+) \(', line)
        if m and not line.startswith(' '):
            cur_name, cur_lines = m.group(1), []
            comps[cur_name] = cur_lines
        elif line.startswith('}'):
            cur_name = None
        elif cur_name is not None:
            cur_lines.append(line)

    # scan/while bodies compile to computations referenced as body=%NAME
    body_names = set(re.findall(r'body=%([\w.\-]+)', txt))
    cands = {n: '\n'.join(ls) for n, ls in comps.items() if n in body_names}
    if not cands:
        cands = {n: '\n'.join(ls) for n, ls in comps.items()
                 if n.startswith('main') or 'ENTRY' in n}
    name, body = max(cands.items(), key=lambda nb: len(nb[1]))
    print(f'computation: {name} ({len(body.splitlines())} instructions)')

    rows = []
    for line in body.splitlines():
        line = line.strip()
        m = re.match(r'%?([\w.\-]+) = (\([^)]*\)|\S+) '
                     r'(fusion|dot|convert|custom-call|reduce|exponential|'
                     r'transpose|copy|broadcast|add|multiply|divide|'
                     r'concatenate|slice|reshape|bitcast)\(', line)
        if not m:
            continue
        op_name, shape, kind = m.groups()
        nbytes = shape_bytes(shape)
        fk = re.search(r'kind=(\w+)', line)
        cal = re.search(r'calls=%?([\w.\-]+)', line)
        rows.append((nbytes, kind, fk.group(1) if fk else '',
                     cal.group(1) if cal else op_name, shape))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f'total output bytes (one scan iteration): {total/1e6:.1f} MB')
    print(f'{"MB":>8s}  {"kind":12s} {"fkind":10s} name / shape')
    by_cat = {}
    for nbytes, kind, fkind, cname, shape in rows:
        key = f'{kind}:{fkind}' if fkind else kind
        by_cat[key] = by_cat.get(key, 0) + nbytes
        if nbytes >= min_mb * 1e6:
            print(f'{nbytes/1e6:8.2f}  {kind:12s} {fkind:10s} '
                  f'{cname[:60]} {shape[:50]}')
    print('--- by category ---')
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f'{v/1e6:8.1f} MB  {k}')


if __name__ == '__main__':
    main()
