#!/usr/bin/env python
"""Filter the HVU annotation json down to one tag category
(parity: reference tools/data/hvu/generate_sub_file_list.py:1-42 —
which also contains an upstream bug: it dumps the UNFILTERED `data`
instead of `result`; this version writes the filtered list, i.e. the
documented intent)."""
import argparse
import json
import os.path as osp

CATEGORIES = ['action', 'attribute', 'concept', 'event', 'object',
              'scene']


def main():
    p = argparse.ArgumentParser()
    p.add_argument('annotation_file')
    p.add_argument('category', choices=CATEGORIES)
    args = p.parse_args()

    with open(args.annotation_file) as f:
        data = json.load(f)
    result = []
    for item in data:
        if args.category in item['label']:
            item = dict(item, label=item['label'][args.category])
            result.append(item)

    base = osp.basename(args.annotation_file).replace(
        'hvu', f'hvu_{args.category}')
    target = osp.join(osp.dirname(args.annotation_file), base)
    with open(target, 'w') as f:
        json.dump(result, f)
    print(f'wrote {len(result)} items -> {target}')


if __name__ == '__main__':
    main()
