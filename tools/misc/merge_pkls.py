#!/usr/bin/env python
"""Merge sharded annotation pkls (parity: reference
tools/misc/merge_pkls.py — merges per-worker flow-extraction outputs
into one annotation file; shards here come from
flow_extraction.py --num-shards)."""
import argparse
import glob
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pattern', help="shard glob, e.g. 'annos_shard*.pkl'")
    p.add_argument('out')
    p.add_argument('--dedup-key', default='video_name')
    args = p.parse_args()
    merged, seen = [], set()
    paths = sorted(glob.glob(args.pattern))
    assert paths, f'no files match {args.pattern}'
    for path in paths:
        with open(path, 'rb') as f:
            annos = pickle.load(f)
        for a in annos:
            key = a.get(args.dedup_key)
            if key is not None and key in seen:
                continue
            if key is not None:
                seen.add(key)
            merged.append(a)
    with open(args.out, 'wb') as f:
        pickle.dump(merged, f)
    print(f'{len(paths)} shards -> {len(merged)} annotations '
          f'-> {args.out}')


if __name__ == '__main__':
    main()
