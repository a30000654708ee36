#!/usr/bin/env python
"""Audit the full MSCL train step's StableHLO for precision/layout waste.

Backend-free (CPU lowering, no TPU needed): lowers the jitted train step,
then inventories the patterns that cost real HBM/VPU time on TPU —
large-f32 elementwise ops (bf16 work silently promoted by an f32
operand), f32 layout transposes, image-scale scatters (`.at[...].set`),
big concatenates, and per-direction convert volume. This is how the
round-3 hue-scatter / f32-factor-promotion / f32-input-transpose wastes
were found (docs/benchmark.md "HLO-level aug audit").

Usage:
    python tools/analysis/audit_hlo.py [--threshold-elems 9000000]
    python tools/analysis/audit_hlo.py --hlo-file dump.txt   # pre-dumped

No reference-repo analogue (the reference has no compile-time audit
tooling); complements the runtime attribution in attribute_fusions.py.
"""
import argparse
import collections
import re
import sys

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def nelem(shape_str: str) -> int:
    n = 1
    for p in shape_str.split('x')[:-1]:
        if p.isdigit():
            n *= int(p)
    return n


def audit(txt: str, threshold: int):
    lines = txt.splitlines()
    report = {}

    big_f32 = []
    for i, line in enumerate(lines):
        m = re.search(r'stablehlo\.(\w+)[^:]*: tensor<([^>]+)>$',
                      line.strip())
        if m and m.group(2).endswith('f32') and \
                nelem(m.group(2)) >= threshold:
            big_f32.append((i, m.group(1), m.group(2)))
    report['big_f32_elementwise'] = big_f32

    convs = re.findall(
        r'stablehlo\.convert %\S+ : \(tensor<([^>]+)>\) -> tensor<([^>]+)>',
        txt)
    vol = collections.Counter()
    for src, dst in convs:
        vol[(src.split('x')[-1], dst.split('x')[-1])] += nelem(src)
    report['convert_volume'] = vol

    t_f32 = [(i, m.group(1)) for i, l in enumerate(lines)
             for m in [re.search(
                 r'stablehlo\.transpose [^:]*: \(tensor<([^>]+f32)>\)', l)]
             if m and nelem(m.group(1)) >= threshold // 10]
    report['f32_transposes'] = t_f32

    scatters = [(i, l.strip()[:100]) for i, l in enumerate(lines)
                if re.search(r'"?stablehlo\.scatter"?\(', l)]
    report['scatters'] = scatters

    big_cc = [(i, m.group(1)) for i, l in enumerate(lines)
              for m in [re.search(
                  r'stablehlo\.concatenate [^)]*\) -> tensor<([^>]+)>', l)]
              if m and nelem(m.group(1)) >= threshold]
    report['big_concats'] = big_cc
    return report


def lower_step():
    """Build + lower the flagship MSCL train step (bf16, bs 32)."""
    import os
    os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
        ' --xla_force_host_platform_device_count=1'
    import jax
    jax.config.update('jax_platforms', 'cpu')
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
        dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4), lr,
        grad_clip=dict(max_norm=40),
        freeze_patterns=('encoder_k', 'neck_k', 'mlp_k'))
    state = init_state(model, tx, batch, post_init_fn=sync_key_variables)
    step = make_train_step(model, tx, build_ema_fn(model))
    dev_batch = {k: [jnp.asarray(v) for v in vs]
                 for k, vs in batch.items()}
    return jax.jit(step, donate_argnums=0).lower(state, dev_batch).as_text()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--hlo-file', help='audit a pre-dumped StableHLO text '
                   'instead of lowering the MSCL step')
    p.add_argument('--threshold-elems', type=int, default=9_000_000)
    p.add_argument('--dump-to', help='also write the lowered module here')
    args = p.parse_args()

    if args.hlo_file:
        txt = open(args.hlo_file).read()
    else:
        txt = lower_step()
        if args.dump_to:
            open(args.dump_to, 'w').write(txt)

    rep = audit(txt, args.threshold_elems)

    print(f'=== f32 elementwise ops >= {args.threshold_elems/1e6:.0f}M '
          f'elems: {len(rep["big_f32_elementwise"])}')
    byop = collections.Counter(op for _, op, _ in rep['big_f32_elementwise'])
    for op, n in byop.most_common():
        print(f'  {op:12s} x{n}')
    for i, op, t in rep['big_f32_elementwise'][:8]:
        print(f'  line {i}: {op} {t}')
    print('=== convert volume by (src -> dst) dtype:')
    for (s, d), v in rep['convert_volume'].most_common(6):
        print(f'  {s:5s} -> {d:5s} {v/1e6:10.1f}M elems')
    print(f'=== f32 transposes >= {args.threshold_elems/10e6:.1f}M: '
          f'{len(rep["f32_transposes"])}')
    for i, t in rep['f32_transposes'][:8]:
        print(f'  line {i}: {t}')
    print(f'=== scatters: {len(rep["scatters"])}')
    for i, s in rep['scatters'][:8]:
        print(f'  line {i}: {s}')
    print(f'=== concatenates >= {args.threshold_elems/1e6:.0f}M: '
          f'{len(rep["big_concats"])}')
    for i, t in rep['big_concats'][:8]:
        print(f'  line {i}: -> {t}')


if __name__ == '__main__':
    main()
