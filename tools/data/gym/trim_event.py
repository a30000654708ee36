#!/usr/bin/env python
"""Cut FineGym event clips out of the raw videos with ffmpeg and emit
the event-level annotation json (parity: reference
tools/data/gym/trim_event.py:1-58; list-form subprocess instead of
shell strings)."""
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
    video_root = osp.join(root, 'videos')
    event_root = osp.join(root, 'events')
    anno_root = osp.join(root, 'annotations')
    os.makedirs(event_root, exist_ok=True)

    with open(osp.join(anno_root, 'annotation.json')) as f:
        annotation = json.load(f)
    videos = set(os.listdir(video_root))

    event_annotation = {}
    for k, v in annotation.items():
        if k + '.mp4' not in videos:
            print(f'video {k} has not been downloaded')
            continue
        video_path = osp.join(video_root, k + '.mp4')
        for event_id, event_anno in v.items():
            start, end = event_anno['timestamps'][0]
            event_name = f'{k}_{event_id}'
            cmd = ['ffmpeg', '-i', video_path, '-ss', str(start),
                   '-t', str(end - start), '-c:v', 'libx264',
                   '-c:a', 'copy', '-threads', str(args.threads),
                   '-loglevel', 'panic',
                   osp.join(event_root, event_name + '.mp4')]
            try:
                subprocess.check_output(cmd, stderr=subprocess.STDOUT)
            except (subprocess.CalledProcessError, FileNotFoundError):
                print(f'Trimming of the Event {event_name} of Video '
                      f'{k} Failed', flush=True)
            if event_anno['segments'] is not None:
                event_annotation[event_name] = event_anno['segments']

    out = osp.join(anno_root, 'event_annotation.json')
    with open(out, 'w') as f:
        json.dump(event_annotation, f)
    print(f'wrote {len(event_annotation)} events -> {out}')


if __name__ == '__main__':
    main()
