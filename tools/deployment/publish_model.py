#!/usr/bin/env python
"""Strip optimizer state from a checkpoint and append a content hash
(parity: tools/deployment/publish_model.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    parser = argparse.ArgumentParser(description='Publish a checkpoint')
    parser.add_argument('in_file')
    parser.add_argument('out_file')
    args = parser.parse_args()
    from mscl_tpu.core import publish_model
    final = publish_model(args.in_file, args.out_file)
    print(f'published to {final}')


if __name__ == '__main__':
    main()
