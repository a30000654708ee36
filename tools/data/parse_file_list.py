#!/usr/bin/env python
"""Frame-directory parsing helpers (parity: reference
tools/data/parse_file_list.py::parse_directory — count rgb/flow frames
per video folder for file-list building)."""
from __future__ import annotations

import fnmatch
import os
import os.path as osp


def parse_directory(path, rgb_prefix='img_', flow_x_prefix='flow_x_',
                    flow_y_prefix='flow_y_', level=1):
    """Returns {video_name: (full_path, n_rgb, n_flow)}; video_name is
    the last `level` path components joined by '/'."""
    print(f'parse frames under directory {path}')
    if level == 1:
        video_dirs = [osp.join(path, d) for d in sorted(os.listdir(path))
                      if osp.isdir(osp.join(path, d))]
    elif level == 2:
        video_dirs = []
        for cls in sorted(os.listdir(path)):
            cdir = osp.join(path, cls)
            if not osp.isdir(cdir):
                continue
            video_dirs += [osp.join(cdir, d)
                           for d in sorted(os.listdir(cdir))
                           if osp.isdir(osp.join(cdir, d))]
    else:
        raise ValueError('level can only be 1 or 2')

    frame_dict = {}
    for vdir in video_dirs:
        files = os.listdir(vdir)
        n_rgb = len(fnmatch.filter(files, rgb_prefix + '*'))
        n_x = len(fnmatch.filter(files, flow_x_prefix + '*'))
        n_y = len(fnmatch.filter(files, flow_y_prefix + '*'))
        if n_x != n_y:
            raise ValueError(f'x and y flow counts differ in {vdir}: '
                             f'{n_x} != {n_y}')
        key = '/'.join(vdir.split('/')[-level:])
        frame_dict[key] = (vdir, n_rgb, n_x)
    print('frame directory analysis done')
    return frame_dict


if __name__ == '__main__':
    import argparse
    import json
    p = argparse.ArgumentParser()
    p.add_argument('path')
    p.add_argument('--level', type=int, default=1)
    p.add_argument('--out', default=None)
    args = p.parse_args()
    d = parse_directory(args.path, level=args.level)
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: [v[0], v[1], v[2]] for k, v in d.items()}, f)
        print(f'wrote {args.out}')
    else:
        for k, v in list(d.items())[:10]:
            print(k, v)
