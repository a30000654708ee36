#!/usr/bin/env python
"""Benchmark the host data pipeline (parity: tools/analysis/
bench_processing.py): time per-sample pipeline latency and the loader's
batches/sec for a config."""
import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Benchmark pipeline')
    parser.add_argument('config')
    parser.add_argument('--split', default='train')
    parser.add_argument('--num-samples', type=int, default=50)
    parser.add_argument('--num-batches', type=int, default=5)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from mscl_tpu.datasets import build_dataloader, build_dataset
    dataset = build_dataset(dict(cfg.data[args.split]))
    n = min(args.num_samples, len(dataset))
    t0 = time.time()
    for i in range(n):
        dataset[i % len(dataset)]
    per_sample = (time.time() - t0) / n
    print(f'pipeline: {per_sample * 1000:.1f} ms/sample '
          f'({1 / per_sample:.1f} samples/s single-thread)')

    loader = build_dataloader(
        dataset, videos_per_gpu=cfg.data['videos_per_gpu'],
        workers_per_gpu=cfg.data.get('workers_per_gpu', 0), num_gpus=1,
        shuffle=True)
    it = iter(loader)
    t0 = time.time()
    count = 0
    for _ in range(min(args.num_batches, len(loader))):
        next(it)
        count += 1
    if count:
        dt = (time.time() - t0) / count
        print(f'loader: {dt * 1000:.1f} ms/batch '
              f'({cfg.data["videos_per_gpu"] / dt:.1f} clips/s)')


if __name__ == '__main__':
    main()
