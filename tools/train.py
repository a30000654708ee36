#!/usr/bin/env python
"""Train a recognizer from a config.

Parity: reference tools/train.py:79-196 — config load/merge/dump, seeding,
build model+datasets, train. The launcher flags (--launcher, dist ranks)
are gone: JAX SPMD uses every visible device through one process
(multi-host via jax.distributed.initialize --coordinator).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mscl_tpu import Config, DictAction  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description='Train a recognizer')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--resume-from',
                        help='checkpoint file to resume from')
    parser.add_argument('--validate', action='store_true',
                        help='evaluate during training')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--deterministic', action='store_true',
                        help='accepted for CLI parity; JAX PRNG is always '
                             'deterministic given --seed')
    parser.add_argument('--max-epochs', type=int, default=None,
                        help='override total_epochs (smoke runs)')
    parser.add_argument('--num-devices', type=int, default=None,
                        help='restrict the mesh to the first N devices')
    parser.add_argument('--coordinator', default=None,
                        help='multi-host: jax.distributed coordinator '
                             'address host:port')
    parser.add_argument('--num-hosts', type=int, default=None)
    parser.add_argument('--host-id', type=int, default=None)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={},
                        help='override config entries key=value')
    return parser.parse_args()


def main():
    args = parse_args()
    if args.coordinator:
        import jax
        jax.distributed.initialize(args.coordinator, args.num_hosts,
                                   args.host_id)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    elif cfg.get('work_dir') is None:
        cfg.work_dir = osp.join(
            './work_dirs', osp.splitext(osp.basename(args.config))[0])
    os.makedirs(cfg.work_dir, exist_ok=True)
    cfg.dump(osp.join(cfg.work_dir, osp.basename(args.config)))

    from mscl_tpu.apis import train_model
    from mscl_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(args.num_devices)
    print(f'mesh: {mesh}')
    train_model(cfg, validate=args.validate, resume_from=args.resume_from,
                seed=args.seed, max_epochs=args.max_epochs, mesh=mesh)


if __name__ == '__main__':
    main()
