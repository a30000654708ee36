#!/usr/bin/env python
"""Analyze training json logs: per-iter timing stats and loss curves.

Parity: reference tools/analysis/analyze_logs.py (cal_train_time :11-33,
plot_curve). Consumes the Runner's log.json (one json record per line).
"""
import argparse
import json

import numpy as np


def load_json_log(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(records, include_outliers=False):
    train = [r for r in records if r.get('mode') == 'train'
             and 'time' in r]
    if not train:
        print('no train records with timing found')
        return
    times = np.array([r['time'] for r in train])
    if not include_outliers:
        times = times[1:] if len(times) > 1 else times
    print(f'slowest iter time: {times.max():.4f}s')
    print(f'fastest iter time: {times.min():.4f}s')
    print(f'time std over iters: {times.std():.4f}s')
    print(f'average iter time: {times.mean():.4f}s')
    data_times = np.array([r.get('data_time', 0.0) for r in train])
    print(f'average data time: {data_times.mean():.4f}s')


def plot_curve(records, keys, out=None, title=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    for key in keys:
        xs, ys = [], []
        for i, r in enumerate(records):
            if key in r:
                xs.append(i)
                ys.append(r[key])
        plt.plot(xs, ys, label=key)
    plt.legend()
    if title:
        plt.title(title)
    if out:
        plt.savefig(out)
        print(f'saved plot to {out}')
    else:
        print('specify --out to save the plot')


def main():
    parser = argparse.ArgumentParser(description='Analyze json logs')
    sub = parser.add_subparsers(dest='task', required=True)
    p1 = sub.add_parser('cal_train_time')
    p1.add_argument('json_logs', nargs='+')
    p1.add_argument('--include-outliers', action='store_true')
    p2 = sub.add_parser('plot_curve')
    p2.add_argument('json_logs', nargs='+')
    p2.add_argument('--keys', nargs='+', default=['loss'])
    p2.add_argument('--out', default=None)
    p2.add_argument('--title', default=None)
    args = parser.parse_args()

    for path in args.json_logs:
        records = load_json_log(path)
        print(f'----- {path} ({len(records)} records) -----')
        if args.task == 'cal_train_time':
            cal_train_time(records, args.include_outliers)
        else:
            plot_curve(records, args.keys, args.out, args.title)


if __name__ == '__main__':
    main()
