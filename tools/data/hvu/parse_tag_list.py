#!/usr/bin/env python
"""Parse the HVU category CSV into the tag->category json
(parity: reference tools/data/hvu/parse_tag_list.py:1-16)."""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--tag-list',
                   default='data/hvu/annotations/hvu_categories.csv')
    p.add_argument('--output', default='hvu_tags.json')
    args = p.parse_args()
    tag_categories = {}
    with open(args.tag_list) as f:
        for line in f.readlines()[1:]:
            tag, category = line.strip().split(',')
            tag_categories.setdefault(category, []).append(tag)
    for tags in tag_categories.values():
        tags.sort()
    with open(args.output, 'w') as f:
        json.dump(tag_categories, f)
    print({k: len(v) for k, v in tag_categories.items()})


if __name__ == '__main__':
    main()
