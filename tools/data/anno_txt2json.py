#!/usr/bin/env python
"""Convert 'path num_frames label...' txt annotation lists to json
(parity: reference tools/data/anno_txt2json.py)."""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument('annofile')
    p.add_argument('--format', default='rawframes',
                   choices=['rawframes', 'videos'])
    args = p.parse_args()
    out = []
    with open(args.annofile) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if args.format == 'rawframes':
                item = dict(frame_dir=parts[0],
                            total_frames=int(parts[1]),
                            label=[int(x) for x in parts[2:]])
            else:
                item = dict(filename=parts[0],
                            label=[int(x) for x in parts[1:]])
            if len(item['label']) == 1:
                item['label'] = item['label'][0]
            out.append(item)
    target = args.annofile.replace('.txt', '.json')
    with open(target, 'w') as f:
        json.dump(out, f)
    print(f'wrote {target} ({len(out)} items)')


if __name__ == '__main__':
    main()
