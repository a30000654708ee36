#!/usr/bin/env python
"""NTURGB+D pose-annotation extraction (parity: reference
tools/data/skeleton/ntu_pose_extraction.py:1-371).

The reference pipeline is: per-frame person detection -> NTU-specific
detection post-processing (dedup, greedy IoU tracklet building, center
-distance tracklet selection, 1-or-2-person assembly) -> top-down pose
-> one anno dict per video. The detector/pose models come from
MMDet/MMPose, which are NOT in this environment — so here the
POST-PROCESSING (the actual algorithm, reimplemented in numpy below,
unit-tested in tests/test_data_tools.py) is importable and reusable,
while the model-driven CLI is gated: it accepts precomputed per-frame
detections/keypoints (npz) and assembles the PoseDataset anno pkl our
`PoseDataset`/`GeneratePoseTarget` consume.

DELIBERATE DIVERGENCE (ADVICE r4): the anno `label` is written 0-based
(``int(...Axxx...) - 1``). The reference writes the raw 1-based NTU
action id, which would index out of range in a ``num_classes``-sized
head; our PoseDataset/heads expect 0-based labels, so the -1 here is
intentional (also noted in PARITY.md).
"""
import argparse
import pickle
from collections import defaultdict

import numpy as np

# NTU mutual-action classes are two-person; everything else one-person
# (reference :254-257)
MUTUAL_ACTIONS = frozenset(range(50, 61)) | frozenset(range(106, 121))


def _area(b):
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def _inter(a, b):
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(0.0, w) * max(0.0, h)


def _iou(a, b):
    i = _inter(a, b)
    return i / max(_area(a) + _area(b) - i, 1e-10)


def remove_duplicate_boxes(boxes, containment=0.8):
    """Drop any box that sits >80% inside a higher-scoring box."""
    if len(boxes) <= 1:
        return boxes
    keep = []
    for i, bi in enumerate(boxes):
        ai = max(_area(bi), 1e-10)
        dominated = any(
            j != i and _inter(bi, bj) / ai > containment and
            bi[4] <= bj[4]
            for j, bj in enumerate(boxes))
        if not dominated:
            keep.append(i)
    return boxes[keep]


def easy_example(dets, n_person, thr=0.95):
    """All frames show exactly n_person boxes above thr -> take them."""
    counts = [int((d[:, -1] > thr).sum()) for d in dets]
    if all(c == counts[0] for c in counts) and counts[0] == n_person:
        return True, np.stack([d[d[:, -1] > thr] for d in dets])
    return False, None


def build_tracklets(dets, iou_thr=0.6, max_gap=10):
    """Greedy IoU association, newest tracklet first (reference
    bbox2tracklet :126-149): a box joins the most recent tracklet whose
    last box overlaps >= iou_thr, that hasn't already taken a box this
    frame, and whose age gap is < max_gap."""
    tracklets = defaultdict(list)   # id -> [(frame, box5)]
    start = {}
    next_id = 0
    for t, frame_boxes in enumerate(dets):
        for box in frame_boxes:
            for tid in range(next_id - 1, -1, -1):
                last_t, last_box = tracklets[tid][-1]
                if (last_t != t and _iou(last_box, box) >= iou_thr and
                        t - start[tid] - len(tracklets[tid]) < max_gap):
                    tracklets[tid].append((t, box))
                    break
            else:
                start[next_id] = t
                tracklets[next_id].append((t, box))
                next_id += 1
    return dict(tracklets)


def prune_tracklets(tracklets, min_len=5, min_area=5000):
    out = {}
    for k, track in tracklets.items():
        if len(track) <= min_len:
            continue
        boxes = np.stack([b for _, b in track]).astype(np.float32)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        if areas.mean() > min_area:
            out[k] = track
    return out


def tracklet_center_distance(track, center=(480.0, 270.0)):
    boxes = np.stack([b for _, b in track])
    cx = (boxes[:, 0] + boxes[:, 2]) / 2 - center[0]
    cy = (boxes[:, 1] + boxes[:, 3]) / 2 - center[1]
    return float(np.hypot(cx, cy).mean())


def densify_tracklet(track, num_frames):
    """One tracklet -> per-frame (num_frames, 5) boxes; frames without a
    confident box borrow the temporally nearest tracked box."""
    bbox = np.zeros((num_frames, 5))
    have = {}
    for t, b in track:
        bbox[t] = b
        have[t] = b
    keys = sorted(have)
    for t in range(num_frames):
        if bbox[t, -1] <= 0.5:
            nearest = min(keys, key=lambda k: abs(k - t))
            bbox[t] = have[nearest]
    return bbox


def merge_tracklets_single(tracklets, num_frames):
    """Single-person hard case: fill frames from tracklets in order of
    screen-center proximity, gated at 2x the best sufficient tracklet's
    distance (min 50); gaps borrow the nearest filled frame."""
    dists = {k: tracklet_center_distance(v) for k, v in tracklets.items()}
    order = sorted(dists, key=dists.get)
    thr = np.inf
    for k in order:
        if len(tracklets[k]) >= num_frames / 2:
            thr = 2 * dists[k]
            break
    thr = max(50.0, thr)
    bbox = np.zeros((num_frames, 5))
    filled = {}
    for k in order:
        if dists[k] < thr:
            for t, b in tracklets[k]:
                if bbox[t, -1] < 0.01:
                    bbox[t] = b
                    filled[t] = b
    for t in range(num_frames):
        if bbox[t, -1] < 0.01 and filled:
            nearest = min(filled, key=lambda k: abs(k - t))
            bbox[t] = filled[nearest]
    return bbox


def assemble_two_person(dets, num_frames):
    """Two-person fallback: top-2 boxes per frame, holes borrow the
    previous frame with IoU-based identity matching."""
    out = np.zeros((num_frames, 2, 5))
    for t, boxes in enumerate(dets):
        if len(boxes) <= 2:
            out[t, :len(boxes)] = boxes
        else:
            top = np.argsort(-boxes[:, -1])[:2]
            out[t] = boxes[top]
    for t in range(num_frames):
        if out[t, 0, -1] <= 0.01:
            out[t] = out[t - 1]
        elif out[t, 1, -1] <= 0.01 and t:
            prev = out[t - 1]
            if prev[0, -1] > 0.01 and prev[1, -1] > 0.01:
                if _iou(out[t, 0], prev[0]) > _iou(out[t, 0], prev[1]):
                    out[t, 1] = prev[1]
                else:
                    out[t, 1] = prev[0]
    return out


def ntu_det_postproc(vid_name, det_results):
    """Per-frame raw detections -> per-frame person box(es), NTU rules
    (reference ntu_det_postproc :251-283)."""
    dets = [remove_duplicate_boxes(np.asarray(d, dtype=float))
            for d in det_results]
    label = int(vid_name.split('/')[-1].split('A')[1][:3])
    n_person = 2 if label in MUTUAL_ACTIONS else 1
    ok, boxes = easy_example(dets, n_person)
    if ok:
        return boxes
    tracklets = prune_tracklets(build_tracklets(dets))
    num_frames = len(dets)
    if n_person == 1:
        if len(tracklets) == 1:
            return densify_tracklet(next(iter(tracklets.values())),
                                    num_frames)
        return merge_tracklets_single(tracklets, num_frames)
    if len(tracklets) <= 2:
        per = [densify_tracklet(t, num_frames)[:, None]
               for t in tracklets.values()]
        return np.concatenate(per, axis=1)
    return assemble_two_person(dets, num_frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('video', help='NTU video path (name carries Axxx)')
    p.add_argument('output', help='output anno .pkl')
    p.add_argument('--det-npz', default=None,
                   help='precomputed per-frame detections: npz with '
                        'arrays det_0..det_{T-1}, each (N, 5) xyxy+score')
    p.add_argument('--kp-npz', default=None,
                   help='precomputed keypoints: npz with keypoint '
                        '(M, T, V, 2) and keypoint_score (M, T, V)')
    p.add_argument('--img-shape', type=int, nargs=2, default=(1080, 1920))
    args = p.parse_args()
    if args.det_npz is None or args.kp_npz is None:
        raise SystemExit(
            'MMDet/MMPose are not available in this environment: supply '
            '--det-npz/--kp-npz produced offline (the NTU detection '
            'post-processing itself runs here; see module docstring).')
    det = np.load(args.det_npz)
    dets = [det[f'det_{t}'] for t in range(len(det.files))]
    boxes = ntu_det_postproc(args.video, dets)
    kp = np.load(args.kp_npz)
    anno = dict(
        frame_dir=args.video.rsplit('/', 1)[-1].rsplit('.', 1)[0],
        label=int(args.video.split('/')[-1].split('A')[1][:3]) - 1,
        img_shape=tuple(args.img_shape),
        original_shape=tuple(args.img_shape),
        total_frames=len(dets),
        num_person_raw=boxes.shape[1] if boxes.ndim == 3 else 1,
        keypoint=kp['keypoint'].astype(np.float16),
        keypoint_score=kp['keypoint_score'].astype(np.float16))
    with open(args.output, 'wb') as f:
        pickle.dump(anno, f)
    print(f'wrote {args.output}')


if __name__ == '__main__':
    main()
