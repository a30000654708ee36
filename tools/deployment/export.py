#!/usr/bin/env python
"""Export a recognizer's inference function as a serialized StableHLO
artifact (TPU-native equivalent of reference
tools/deployment/pytorch2onnx.py:1-170 — ONNX is torch's portable
graph format; jax.export/StableHLO is JAX's).

The exported artifact is loadable with jax.export.deserialize and
runnable on any backend; --verify round-trips it and checks outputs
match the live model.
"""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description='export recognizer to StableHLO')
    parser.add_argument('config')
    parser.add_argument('checkpoint', help="checkpoint path or ''")
    parser.add_argument('--output-file', default='model.stablehlo')
    parser.add_argument('--shape', type=int, nargs='+',
                        default=[1, 1, 3, 8, 112, 112],
                        help='input imgs shape (NCTHW with clip dim)')
    parser.add_argument('--verify', action='store_true')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from mscl_tpu.apis.inference import init_recognizer

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    model, variables, cfg = init_recognizer(cfg,
                                            args.checkpoint or None)

    def infer(imgs):
        return model.apply(variables, imgs, return_loss=False)

    x = jnp.zeros(tuple(args.shape), jnp.float32)
    exported = jax_export.export(jax.jit(infer))(x)
    blob = exported.serialize()
    with open(args.output_file, 'wb') as f:
        f.write(blob)
    print(f'wrote {args.output_file} ({len(blob) / 1e6:.2f} MB, '
          f'in {exported.in_avals}, out {exported.out_avals})')

    if args.verify:
        rng = np.random.default_rng(0)
        sample = jnp.asarray(rng.uniform(size=tuple(args.shape)),
                             jnp.float32)
        restored = jax_export.deserialize(bytearray(blob))
        got = np.asarray(restored.call(sample))
        want = np.asarray(infer(sample))
        err = float(np.max(np.abs(got - want)))
        print(f'verify: max |restored - live| = {err:.3e}')
        assert err < 1e-4, 'exported artifact diverges from live model'
        print('The exported StableHLO artifact matches the live model.')


if __name__ == '__main__':
    main()
