#!/usr/bin/env python
"""Aggregate ablation-ordering arm JSONs into one table + evidence JSON.

Reads docs/evidence/ablation/{arm}_{scale}_s{seed}.json (produced by
ablation_ordering.py, one file per arm x seed), and prints the
markdown table PARITY.md carries: per-arm mean (min-max over seeds) of
the final downstream metrics, with the shared random-init row as the
floor. The ordering claim under test is the reference paper's central
table (reference README.md:3-6 and configs/recognition/moco ablations):
motion machinery (MSCL) > cross-modal distillation (MoDist) > plain
appearance contrastive (MoCo) at motion-discriminative representation.

    python tools/analysis/ablation_summary.py --scale full \
        --out docs/evidence/ablation/summary_full.json
"""
import argparse
import glob
import json
import os
import re

ARM_ORDER = ('moco', 'modist', 'mscl_nofra', 'mscl', 'mscl_nomds')
ARM_LABEL = {
    'moco': 'MoCoV2 (RGB only)',
    'modist': 'MoDist (+flow tower, cross-modal)',
    'mscl_nofra': 'MSCL w/o FRA (single flow pass)',
    'mscl': 'MSCL full (FRA double pass)',
    'mscl_nomds': 'MSCL w/o MDS (uniform sampling)',
}


def collect(out_dir, scale):
    runs = {}
    for path in sorted(glob.glob(os.path.join(
            out_dir, f'*_{scale}_s*.json'))):
        name = os.path.basename(path)
        m = re.match(rf'(\w+?)_{scale}_s(\d+)\.json$', name)
        if not m or m.group(1) not in ARM_ORDER:
            continue
        with open(path) as f:
            d = json.load(f)
        runs.setdefault(m.group(1), {})[int(m.group(2))] = d
    return runs


def flat(metrics):
    return {'motion_R@1': metrics['motion']['R@1'],
            'motion_R@5': metrics['motion']['R@5'],
            'probe_acc': metrics['probe_acc'],
            'instance_R@1': metrics['instance_R1']}


def agg(vals):
    lo, hi = min(vals), max(vals)
    mean = sum(vals) / len(vals)
    if len(vals) == 1:
        return f'{mean:.3f}'
    return f'{mean:.3f} [{lo:.3f}-{hi:.3f}]'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dir', default='docs/evidence/ablation')
    p.add_argument('--scale', default='full')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    runs = collect(args.dir, args.scale)
    if not runs:
        raise SystemExit(f'no {args.scale}-scale arm JSONs in {args.dir}')

    cols = ('motion_R@1', 'motion_R@5', 'probe_acc', 'instance_R@1')
    print(f'| arm | seeds | {" | ".join(cols)} |')
    print('|' + '---|' * (len(cols) + 2))

    # shared random-init floor (same data + eval across arms; init
    # differs only by arm architecture -> report the multi-tower one)
    init_src = runs.get('mscl') or next(iter(runs.values()))
    init = flat(init_src[min(init_src)]['init'])
    print('| random init (floor) | — | ' +
          ' | '.join(f'{init[c]:.3f}' for c in cols) + ' |')

    summary = {'scale': args.scale, 'init_floor': init, 'arms': {}}
    for arm in ARM_ORDER:
        if arm not in runs:
            continue
        seeds = sorted(runs[arm])
        per = {c: [flat(runs[arm][s]['final'])[c] for s in seeds]
               for c in cols}
        summary['arms'][arm] = {
            'label': ARM_LABEL[arm], 'seeds': seeds,
            'final_mean': {c: sum(v) / len(v) for c, v in per.items()},
            'final_per_seed': per,
            'init_per_seed': {c: [flat(runs[arm][s]['init'])[c]
                                  for s in seeds] for c in cols},
        }
        print(f'| {ARM_LABEL[arm]} | {len(seeds)} | ' +
              ' | '.join(agg(per[c]) for c in cols) + ' |')

    # the ordering verdicts the paper's table implies
    def mean_of(arm, c):
        return summary['arms'][arm]['final_mean'][c] \
            if arm in summary['arms'] else None

    checks = {}
    for c in ('motion_R@1', 'probe_acc'):
        mscl, modist, moco = (mean_of('mscl', c), mean_of('modist', c),
                              mean_of('moco', c))
        if None not in (mscl, modist, moco):
            checks[f'{c}: MSCL > MoCo'] = bool(mscl > moco)
            checks[f'{c}: MoDist > MoCo'] = bool(modist > moco)
            checks[f'{c}: MSCL > MoDist'] = bool(mscl > modist)
    summary['ordering_checks'] = checks
    print()
    for k, v in checks.items():
        print(f'  {"PASS" if v else "FAIL"}  {k}')

    if args.out:
        with open(args.out, 'w') as f:
            json.dump(summary, f, indent=1)
        print(f'\nwrote {args.out}')


if __name__ == '__main__':
    main()
