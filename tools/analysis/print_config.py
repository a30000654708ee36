#!/usr/bin/env python
"""Print the fully-resolved config (parity: tools/analysis/print_config.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu import Config, DictAction  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description='Print a config')
    parser.add_argument('config')
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    print(cfg.pretty_text)


if __name__ == '__main__':
    main()
