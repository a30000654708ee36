#!/usr/bin/env python
"""Offline optical-flow extraction: frames -> np4 flow blobs + annotations.

Parity: reference tools/misc/flow_extraction_meg.py — sample frame windows
with the MSCL geometry (num_flow per window, gap between flow frames,
adjacent frame offset for each pair; :40-67), run RAFT (batched,
jitted), encode flow as .np4 (msgpack+lz4, :102-119) and emit the
annotation pickle the FileRawframeDataset consumes. The reference shards
work over an rrun fleet; here one process drives the TPU with batched
inference (multi-host sharding via --shard-index/--num-shards).

A TVL1 (cv2) fallback covers environments without RAFT weights
(parity: tools/misc/flow_extraction.py:28+).
"""
import argparse
import os
import os.path as osp
import pickle
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.utils.np4 import np4_encode  # noqa: E402


def window_indices(num_frames, gap=2, adjacent=8):
    """Flow-pair frame indices: pairs (i, i+adjacent) for
    i in range(0, num_frames-adjacent, gap) — mirrors MatchFlow's
    consumption geometry (reference flow_extraction_meg.py:52-67)."""
    return [(i, i + adjacent)
            for i in range(0, num_frames - adjacent, gap)]


def make_raft_fn(weights_path, iters=12):
    import jax
    import jax.numpy as jnp
    from mscl_tpu.flow.raft import RAFT, load_torch_raft_weights
    model = RAFT(iters=iters)
    if weights_path:
        variables = load_torch_raft_weights(weights_path)
    else:
        print('WARNING: no RAFT weights given — using random init '
              '(only useful for pipeline smoke tests)', file=sys.stderr)
        dummy = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), dummy, dummy)

    @jax.jit
    def run(img1, img2):
        _, flow_up = model.apply(variables, img1, img2)
        return flow_up

    def raft_fn(img1_batch, img2_batch):
        # pad H/W to multiples of 8 (reference utils InputPadder)
        h, w = img1_batch.shape[1:3]
        ph, pw = (-h) % 8, (-w) % 8
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            img1_batch = np.pad(img1_batch, pad, mode='edge')
            img2_batch = np.pad(img2_batch, pad, mode='edge')
        flow = np.asarray(run(jnp.asarray(img1_batch, jnp.float32),
                              jnp.asarray(img2_batch, jnp.float32)))
        return flow[:, :h, :w]

    return raft_fn


def make_arflow_fn(iters_unused=None):
    """PWC-Lite (ARFlow) extractor — the reference's lightweight
    alternative to RAFT (tools/ARFlow/inference.py)."""
    import jax
    import jax.numpy as jnp
    from mscl_tpu.flow.pwclite import PWCLite
    model = PWCLite(n_frames=2)
    dummy = jnp.zeros((1, 2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy)
    print('WARNING: ARFlow runs from random init unless trained — '
          'only useful for pipeline smoke tests', file=sys.stderr)

    @jax.jit
    def run(x):
        return model.apply(variables, x)['flows_fw'][0]

    def arflow_fn(img1_batch, img2_batch):
        h, w = img1_batch.shape[1:3]
        ph, pw = (-h) % 64, (-w) % 64
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            img1_batch = np.pad(img1_batch, pad, mode='edge')
            img2_batch = np.pad(img2_batch, pad, mode='edge')
        x = np.stack([img1_batch, img2_batch], axis=1) / 255.0
        flow = np.asarray(run(jnp.asarray(x, jnp.float32)))
        return flow[:, :h, :w]

    return arflow_fn


def tvl1_fn(img1_batch, img2_batch):
    """OpenCV TVL1 baseline (reference flow_extraction.py:28+)."""
    if not hasattr(cv2, 'optflow'):
        raise RuntimeError('cv2.optflow unavailable; use --method raft')
    tvl1 = cv2.optflow.DualTVL1OpticalFlow_create()
    out = []
    for a, b in zip(img1_batch, img2_batch):
        g1 = cv2.cvtColor(a.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        g2 = cv2.cvtColor(b.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        out.append(tvl1.calc(g1, g2, None))
    return np.stack(out)


def list_videos(frames_root):
    videos = []
    for name in sorted(os.listdir(frames_root)):
        vdir = osp.join(frames_root, name)
        if not osp.isdir(vdir):
            continue
        frames = sorted(
            osp.join(vdir, f) for f in os.listdir(vdir)
            if f.lower().endswith(('.jpg', '.jpeg', '.png')))
        if frames:
            videos.append((name, frames))
    return videos


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('frames_root',
                        help='dir of per-video frame directories')
    parser.add_argument('out_root', help='output dir for flow blobs')
    parser.add_argument('--anno-out', required=True,
                        help='output annotation pickle')
    parser.add_argument('--labels', default=None,
                        help='optional "video_name label" txt file')
    parser.add_argument('--method', default='raft',
                        choices=['raft', 'arflow', 'tvl1'])
    parser.add_argument('--raft-weights', default=None,
                        help='official RAFT .pth to convert')
    parser.add_argument('--iters', type=int, default=12)
    parser.add_argument('--gap', type=int, default=2)
    parser.add_argument('--adjacent', type=int, default=8)
    parser.add_argument('--batch-size', type=int, default=8)
    parser.add_argument('--scale-hw', type=int, nargs=2, default=None,
                        help='resize frames before flow (h w); flow is '
                             'stored at this resolution')
    parser.add_argument('--num-shards', type=int, default=1)
    parser.add_argument('--shard-index', type=int, default=0)
    args = parser.parse_args()

    labels = {}
    if args.labels:
        with open(args.labels) as f:
            for line in f:
                name, lab = line.split()
                labels[name] = int(lab)

    if args.method == 'raft':
        flow_fn = make_raft_fn(args.raft_weights, args.iters)
    elif args.method == 'arflow':
        flow_fn = make_arflow_fn()
    else:
        flow_fn = tvl1_fn

    videos = list_videos(args.frames_root)
    videos = videos[args.shard_index::args.num_shards]
    os.makedirs(args.out_root, exist_ok=True)
    annos = []
    for vid_idx, (name, frames) in enumerate(videos):
        pairs = window_indices(len(frames), args.gap, args.adjacent)
        if not pairs:
            continue
        vout = osp.join(args.out_root, name)
        os.makedirs(vout, exist_ok=True)
        flow_paths = []
        for start in range(0, len(pairs), args.batch_size):
            chunk = pairs[start:start + args.batch_size]

            def load(i):
                img = cv2.imread(frames[i], cv2.IMREAD_COLOR)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                if args.scale_hw:
                    img = cv2.resize(img, (args.scale_hw[1],
                                           args.scale_hw[0]))
                return img

            img1 = np.stack([load(i) for i, _ in chunk])
            img2 = np.stack([load(j) for _, j in chunk])
            flows = flow_fn(img1, img2)
            for (i, _), flow in zip(chunk, flows):
                p = osp.join(vout, f'flow_{len(flow_paths):05d}.np4')
                with open(p, 'wb') as f:
                    f.write(np4_encode(flow.astype(np.float32)))
                flow_paths.append(p)
        annos.append(dict(frames=frames, enc_flows=flow_paths,
                          label=labels.get(name, 0), video_name=name))
        if (vid_idx + 1) % 10 == 0:
            print(f'{vid_idx + 1}/{len(videos)} videos done')

    with open(args.anno_out, 'wb') as f:
        pickle.dump(annos, f)
    print(f'wrote {len(annos)} videos -> {args.anno_out}')


if __name__ == '__main__':
    main()
