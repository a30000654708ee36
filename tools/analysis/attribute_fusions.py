#!/usr/bin/env python
"""Join the profiled per-fusion timings (profile_step.py trace) with the
TPU-compiled HLO: for each hot fusion, print its root op, operand shapes
and the jax op_name metadata (source attribution). This is how the
"which 0.46 ms fusion is which" question gets answered on the axon
backend, where the trace carries no long_name args."""
import argparse
import collections
import glob
import gzip
import json
import re
import sys

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def load_trace_times(trace_dir, iters=3):
    paths = sorted(glob.glob(
        f'{trace_dir}/plugins/profile/*/*.trace.json.gz'))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data['traceEvents']
    pids = {e['pid']: e['args'].get('name', '') for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    rows = collections.defaultdict(float)
    for e in events:
        if e.get('ph') == 'X' and 'dur' in e and \
                'TPU' in pids.get(e.get('pid'), ''):
            name = e.get('name', '')
            if name.startswith('jit_') or name.isdigit():
                continue
            rows[name] += e['dur']
    return {k: v / 1e3 / iters for k, v in rows.items()}


def parse_hlo_computations(txt):
    """fusion name -> (called computation name, kind). computation name
    -> list of (op line)."""
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r'%?([\w\.\-]+) \([^)]*\) -> .* {', line)
        if m:
            cur = m.group(1)
            comps[cur] = []
            continue
        if line.startswith('}'):
            cur = None
            continue
        if cur is not None and ('=' in line):
            comps[cur].append(line.strip())
    return comps


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--trace-dir', default='/tmp/mscl_step_trace')
    p.add_argument('--hlo-out', default='/tmp/mscl_step_hlo.txt')
    p.add_argument('--top', type=int, default=40)
    p.add_argument('--reuse-hlo', action='store_true')
    p.add_argument('--self-trace', action='store_true',
                   help='run + trace the step in this process (one '
                        'compile serves both HLO and timings)')
    args = p.parse_args()

    if args.reuse_hlo:
        txt = open(args.hlo_out).read()
    else:
        import jax
        import jax.numpy as jnp
        from __graft_entry__ import _mscl_batch, _mscl_cfg
        from mscl_tpu.apis.train import build_model_from_cfg
        from mscl_tpu.core import (build_lr_schedule, build_optimizer,
                                   init_state, make_train_step)
        from mscl_tpu.models.recognizers import build_ema_fn, \
            sync_key_variables
        cfg = _mscl_cfg(num_frames=8, K=65536, max_iters=219136 * 400)
        dtype = jnp.bfloat16
        cfg['dtype'] = dtype
        cfg['recognizer'] = dict(cfg['recognizer'], dtype=dtype)
        cfg['recognizer_flow'] = dict(cfg['recognizer_flow'], dtype=dtype)
        model = build_model_from_cfg(cfg)
        batch = _mscl_batch(32)
        lr = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0),
                               0.02, 400, 1712)
        tx = build_optimizer(
            dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4),
            lr, grad_clip=dict(max_norm=40),
            freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
        state = init_state(model, tx, batch,
                           post_init_fn=sync_key_variables)
        batch = {k: [jnp.asarray(v) for v in vs]
                 for k, vs in batch.items()}
        step = jax.jit(make_train_step(model, tx, build_ema_fn(model)))
        txt = step.lower(state, batch).compile().as_text()
        with open(args.hlo_out, 'w') as f:
            f.write(txt)
        print(f'wrote {len(txt)} bytes of HLO to {args.hlo_out}',
              file=sys.stderr)
        if args.self_trace:
            for _ in range(3):
                state, log_vars = step(state, batch)
            float(jax.device_get(log_vars['loss']))
            with jax.profiler.trace(args.trace_dir):
                for _ in range(3):
                    state, log_vars = step(state, batch)
                float(jax.device_get(log_vars['loss']))

    times = load_trace_times(args.trace_dir)
    comps = parse_hlo_computations(txt)
    # fusion instruction lines live inside the entry/other computations:
    # map fusion result name -> called computation
    fusion_calls = dict(re.findall(
        r'%([\w\.\-]+) = [^=]*? fusion\([^)]*\)[^\n]*?calls=%([\w\.\-]+)',
        txt))

    def describe(comp_name):
        ops = comps.get(comp_name, [])
        # heaviest ops first: convolution, dot, reduce, then count
        interesting = [o for o in ops if re.search(
            r'convolution|dot\(|reduce\(|reduce-window|scatter|gather',
            o)]
        out = []
        for o in interesting[:3]:
            meta = re.search(r'op_name="([^"]*)"', o)
            shape = o.split('=', 1)[1].strip().split(' ')[0]
            kind = re.search(r'(convolution|dot|reduce-window|reduce|'
                             r'scatter|gather)', o).group(1)
            out.append(f'{kind} {shape} ' +
                       (meta.group(1)[-110:] if meta else ''))
        if not out and ops:
            meta = None
            for o in reversed(ops):
                m = re.search(r'op_name="([^"]*)"', o)
                if m:
                    meta = m.group(1)
                    break
            out.append(f'elementwise x{len(ops)} ' +
                       (meta[-110:] if meta else ''))
        return out

    total = sum(times.values())
    print(f'total accounted: {total:.2f} ms/step')
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:args.top]:
        comp = fusion_calls.get(name)
        desc = describe(comp) if comp else ['<no HLO match>']
        print(f'{t:8.3f} ms  {name}')
        for d in desc:
            print(f'           | {d}')


if __name__ == '__main__':
    main()
    import os
    os._exit(0)
