#!/usr/bin/env python
"""Build the ActivityNet video-level and clip-level rawframe file lists
(parity: reference tools/data/activitynet/generate_rawframes_filelist.py
:18-113 — same four outputs, CLI paths).

- anet_{train,val}_video.txt : `<dir> <num_frames> <label>` per video,
  label = index of the FIRST annotation's class in action_name.csv.
- anet_{train,val}_clip.txt  : `<dir> <start> <length> <label>` per
  annotated segment, frame indices from segment seconds * (frames /
  duration), end clamped to num_frames - 1.
"""
import argparse
import json
import os
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', default='data/ActivityNet')
    p.add_argument('--rawframe-dir', default=None,
                   help='default <data-root>/rawframes')
    p.add_argument('--action-name-list', default='action_name.csv')
    args = p.parse_args()
    root = args.data_root
    rawframe_dir = args.rawframe_dir or osp.join(root, 'rawframes')

    with open(osp.join(root, 'activity_net.v1-3.min.json')) as f:
        database = json.load(f)['database']
    with open(args.action_name_list) as f:
        labels = [x.strip() for x in f.readlines()[1:]]

    dirs = {d: osp.join(rawframe_dir, d)
            for d in os.listdir(rawframe_dir)}

    def find_dir(video_id):
        # frame dirs are named v_<id> (or contain the id)
        for name, path in dirs.items():
            if video_id in name:
                return name, len(os.listdir(path))
        return None, None

    split = {'training': ({}, {}), 'validation': ({}, {})}
    for vid, data in database.items():
        subset = data['subset']
        if subset not in split:
            continue
        annos = data['annotations']
        label = labels.index(annos[0]['label'])
        dir_name, num_frames = find_dir(vid)
        if dir_name is None:
            continue
        videos, keys = split[subset]
        videos[dir_name] = (num_frames, label)
        keys[dir_name] = vid

    for subset, tag in (('training', 'train'), ('validation', 'val')):
        videos, keys = split[subset]
        video_lines, clip_lines = [], []
        for d, (num_frames, label) in videos.items():
            video_lines.append(f'{d} {num_frames} {label}')
            anno = database[keys[d]]
            fps = num_frames / anno['duration']
            for seg in anno['annotations']:
                s, e = seg['segment']
                start, end = int(s * fps), min(int(e * fps),
                                               num_frames - 1)
                lab = labels.index(seg['label'])
                clip_lines.append(f'{d} {start} {end - start + 1} {lab}')
        for name, lines in ((f'anet_{tag}_video.txt', video_lines),
                            (f'anet_{tag}_clip.txt', clip_lines)):
            path = osp.join(root, name)
            with open(path, 'w') as f:
                f.write('\n'.join(lines))
            print(f'wrote {len(lines)} lines -> {path}')


if __name__ == '__main__':
    main()
