#!/usr/bin/env python
"""Build annotation files from a frames directory
(parity: tools/data/build_file_list.py).

Emits either the classic rawframes txt ('frame_dir total_frames label')
or the local-file pickle format the MSCL datasets consume
(frames/enc_flows/chosen_idx/label dicts).
"""
import argparse
import glob
import os
import os.path as osp
import pickle


def main():
    parser = argparse.ArgumentParser(description='Build file lists')
    parser.add_argument('frames_root')
    parser.add_argument('out_file', help='.txt or .pkl')
    parser.add_argument('--labels', default=None,
                        help='"video_name label" txt; default label 0')
    parser.add_argument('--flow-root', default=None,
                        help='optional per-video flow blob dirs '
                             '(enables enc_flows in pkl output)')
    parser.add_argument('--split-list', default=None,
                        help='restrict to video names in this file')
    args = parser.parse_args()

    labels = {}
    if args.labels:
        with open(args.labels) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    labels[parts[0]] = int(parts[1])
    allowed = None
    if args.split_list:
        with open(args.split_list) as f:
            allowed = set(line.strip() for line in f if line.strip())

    entries = []
    for vdir in sorted(glob.glob(osp.join(args.frames_root, '*'))):
        if not osp.isdir(vdir):
            continue
        name = osp.basename(vdir)
        if allowed is not None and name not in allowed:
            continue
        frames = sorted(glob.glob(osp.join(vdir, 'img_*.jpg')))
        if not frames:
            continue
        entry = dict(video_name=name, frames=frames,
                     label=labels.get(name, 0))
        if args.flow_root:
            flows = sorted(glob.glob(osp.join(args.flow_root, name,
                                              'flow_*.np4')))
            entry['enc_flows'] = flows
        entries.append(entry)

    if args.out_file.endswith('.pkl'):
        with open(args.out_file, 'wb') as f:
            pickle.dump(entries, f)
    else:
        with open(args.out_file, 'w') as f:
            for e in entries:
                f.write(f'{e["video_name"]} {len(e["frames"])} '
                        f'{e["label"]}\n')
    print(f'wrote {len(entries)} entries to {args.out_file}')


if __name__ == '__main__':
    main()
