#!/usr/bin/env python
"""Cut FineGym subaction clips out of the event clips with ffmpeg
(parity: reference tools/data/gym/trim_subaction.py:1-52; each
subaction spans its first timestamp's start to its last timestamp's
end)."""
import argparse
import json
import os
import os.path as osp
import subprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-root', default='data/gym')
    p.add_argument('--threads', type=int, default=8)
    args = p.parse_args()
    root = args.data_root
    event_root = osp.join(root, 'events')
    subaction_root = osp.join(root, 'subactions')
    os.makedirs(subaction_root, exist_ok=True)

    with open(osp.join(root, 'annotations',
                       'event_annotation.json')) as f:
        annotation = json.load(f)
    events = set(os.listdir(event_root))

    for k, v in annotation.items():
        if k + '.mp4' not in events:
            print(f'video {k[:11]} has not been downloaded or the '
                  f'event clip {k} not generated')
            continue
        video_path = osp.join(event_root, k + '.mp4')
        for subaction_id, subaction_anno in v.items():
            ts = subaction_anno['timestamps']
            start, end = ts[0][0], ts[-1][1]
            name = f'{k}_{subaction_id}'
            cmd = ['ffmpeg', '-i', video_path, '-ss', str(start),
                   '-t', str(end - start), '-c:v', 'libx264',
                   '-c:a', 'copy', '-threads', str(args.threads),
                   '-loglevel', 'panic',
                   osp.join(subaction_root, name + '.mp4')]
            try:
                subprocess.check_output(cmd, stderr=subprocess.STDOUT)
            except (subprocess.CalledProcessError, FileNotFoundError):
                print(f'Trimming of the Subaction {name} of Event {k} '
                      f'Failed', flush=True)


if __name__ == '__main__':
    main()
