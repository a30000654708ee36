#!/usr/bin/env python
"""Bucket the WHOLE profiled step (not just top-40) by subsystem.

Joins the saved profiler trace with the compiled HLO's op_name metadata
(the same join as attribute_fusions.py) and aggregates device time into
coarse buckets: rgb q fwd / gidot dx / grad-weight, k tower, flow tower,
device aug, heads+losses, optimizer/EMA/queue, copies, other. Offline —
reuses /tmp artifacts, no TPU run needed.

Usage: python tools/analysis/categorize_step.py \
           [--trace-dir /tmp/mscl_step_trace] \
           [--hlo /tmp/mscl_step_hlo.txt] [--iters 5]
"""
import argparse
import collections
import re
import sys

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])

from tools.analysis.attribute_fusions import (load_trace_times,
                                              parse_hlo_computations)


def fusion_meta_paths(txt):
    """fusion name -> op_name strings inside its computation, with any
    CONVOLUTION/dot op_names FIRST. XLA multi-output fusions routinely
    mix subsystems (a conv fused with the NEXT op's BN reduce), so
    bucketing must follow the dominant (MXU) op, not whichever op_name
    happens to match a pattern first."""
    comps = parse_hlo_computations(txt)
    fusion_calls = dict(re.findall(
        r'%([\w\.\-]+) = [^=]*? fusion\([^)]*\)[^\n]*?calls=%([\w\.\-]+)',
        txt))
    out = {}
    for fus, comp in fusion_calls.items():
        heavy, rest = [], []
        for op in comps.get(comp, []):
            m = re.search(r'op_name="([^"]*)"', op)
            if not m:
                continue
            if re.search(r' convolution\(| dot\(', op):
                heavy.append(m.group(1))
            else:
                rest.append(m.group(1))
        out[fus] = heavy + rest
    return out


BUCKETS = (
    # order matters: first match wins
    ('flow tower', r'recognizer_flow'),
    ('k tower (rgb)', r'_key_forward'),
    ('rgb grad-weight', r'encoder_q.*transpose\(jvp'),
    ('rgb q tower', r'recognizer_m\..*(encoder_q|neck_q|mlp_q)'),
    ('device aug', r'aug_gpu|SyncMoCo|FlowVis|MotionMap|MoCoAugment'),
    ('heads/losses', r'head|loss|logits|InfoNCE|einsum'),
    ('opt/EMA/queue', r'trace|decayed|clip_by|apply_updates|ema|'
                      r'dynamic_update_slice|queue'),
)


def bucket_of(metas):
    if not metas:
        return 'no-metadata'
    # first meta is the heavy (conv/dot) op when one exists — bucket by
    # it alone; fall back to the joined surface for pure-VPU fusions
    for name, pat in BUCKETS:
        if re.search(pat, metas[0]):
            return name
    joined = ' '.join(metas)
    for name, pat in BUCKETS:
        if re.search(pat, joined):
            return name
    return 'other'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--trace-dir', default='/tmp/mscl_step_trace')
    p.add_argument('--hlo', default='/tmp/mscl_step_hlo.txt')
    p.add_argument('--iters', type=int, default=5)
    p.add_argument('--show', type=int, default=12,
                   help='top-N fusions listed per bucket')
    args = p.parse_args()

    times = load_trace_times(args.trace_dir, iters=args.iters)
    txt = open(args.hlo).read()
    metas = fusion_meta_paths(txt)

    per_bucket = collections.defaultdict(list)
    for name, t in times.items():
        if name.startswith('copy'):
            b = 'copies'
        else:
            b = bucket_of(metas.get(name, []))
        per_bucket[b].append((t, name))

    total = sum(times.values())
    print(f'total accounted: {total:.2f} ms/step')
    for b, rows in sorted(per_bucket.items(),
                          key=lambda kv: -sum(t for t, _ in kv[1])):
        s = sum(t for t, _ in rows)
        print(f'\n{b:18s} {s:7.2f} ms  ({100 * s / total:4.1f}%)  '
              f'{len(rows)} fusions')
        for t, name in sorted(rows, reverse=True)[:args.show]:
            m = metas.get(name, [])
            tail = (m[0][-90:] if m else '')
            print(f'   {t:7.3f}  {name:28s} {tail}')


if __name__ == '__main__':
    main()
