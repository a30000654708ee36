"""Frame sampling and decoding transforms.

Parity targets:
  - SampleFrames            mmaction/datasets/pipelines/loading.py:83-270
  - DenseSampleFrames       loading.py (dense variant)
  - RawFrameDecode          loading.py (disk JPEG frames)
  - OpenCVInit/OpenCVDecode loading.py (video files via cv2)
  - LocalDecode             NoriDecode loading.py:1812-1914 re-targeted at the
                            local filesystem — the reference README's own TODO
                            ("transfer data pipeline from OSS to basic file
                            system", README.md:38-41). Reads per-frame JPEGs
                            from ``img_paths``/``flow_img_paths`` and raw
                            float flow from ``flow_paths`` (np4/npy blobs).
"""
from __future__ import annotations

import os.path as osp

import cv2
import numpy as np

from ..builder import PIPELINES
from ...utils.np4 import np4_decode


def _sample_train_offsets(num_frames, clip_len, frame_interval, num_clips,
                          keep_tail_frames=False):
    """Train-mode clip offsets (reference loading.py:137-179)."""
    ori_clip_len = clip_len * frame_interval
    if keep_tail_frames:
        avg_interval = (num_frames - ori_clip_len + 1) / float(num_clips)
        if num_frames > ori_clip_len - 1:
            base_offsets = np.arange(num_clips) * avg_interval
            clip_offsets = (base_offsets + np.random.uniform(
                0, avg_interval, num_clips)).astype(np.int64)
        else:
            clip_offsets = np.zeros((num_clips,), dtype=np.int64)
        return clip_offsets
    avg_interval = (num_frames - ori_clip_len + 1) // num_clips
    if avg_interval > 0:
        base_offsets = np.arange(num_clips) * avg_interval
        clip_offsets = base_offsets + np.random.randint(
            avg_interval, size=num_clips)
    elif num_frames > max(num_clips, ori_clip_len):
        clip_offsets = np.sort(np.random.randint(
            num_frames - ori_clip_len + 1, size=num_clips))
    elif avg_interval == 0:
        ratio = (num_frames - ori_clip_len + 1.0) / num_clips
        clip_offsets = np.around(np.arange(num_clips) * ratio)
    else:
        clip_offsets = np.zeros((num_clips,), dtype=np.int64)
    return clip_offsets.astype(np.int64)


def _sample_test_offsets(num_frames, clip_len, frame_interval, num_clips,
                         twice_sample=False):
    """Test-mode clip offsets (reference loading.py:181-204)."""
    ori_clip_len = clip_len * frame_interval
    avg_interval = (num_frames - ori_clip_len + 1) / float(num_clips)
    if num_frames > ori_clip_len - 1:
        base_offsets = np.arange(num_clips) * avg_interval
        clip_offsets = (base_offsets + avg_interval / 2.0).astype(np.int64)
        if twice_sample:
            clip_offsets = np.concatenate(
                [clip_offsets, base_offsets.astype(np.int64)])
    else:
        clip_offsets = np.zeros((num_clips,), dtype=np.int64)
    return clip_offsets


def expand_offsets_to_inds(clip_offsets, clip_len, frame_interval,
                           total_frames, out_of_bound_opt='loop',
                           temporal_jitter=False):
    """Offsets -> flat frame indices with OOB handling
    (reference loading.py:222-253)."""
    frame_inds = clip_offsets[:, None] + np.arange(
        clip_len)[None, :] * frame_interval
    frame_inds = np.concatenate(frame_inds)
    if temporal_jitter:
        perframe_offsets = np.random.randint(
            frame_interval, size=len(frame_inds))
        frame_inds += perframe_offsets
    frame_inds = frame_inds.reshape((-1, clip_len))
    if out_of_bound_opt == 'loop':
        frame_inds = np.mod(frame_inds, total_frames)
    elif out_of_bound_opt == 'repeat_last':
        safe_inds = frame_inds < total_frames
        unsafe_inds = 1 - safe_inds
        last_ind = np.max(safe_inds * frame_inds, axis=1)
        frame_inds = (safe_inds * frame_inds + (unsafe_inds.T * last_ind).T)
    else:
        raise ValueError('Illegal out_of_bound option.')
    return np.concatenate(frame_inds)


@PIPELINES.register_module()
class SampleFrames:
    """Sample clip_len frames x num_clips from a video
    (reference loading.py:83-270)."""

    def __init__(self, clip_len, frame_interval=1, num_clips=1,
                 temporal_jitter=False, twice_sample=False,
                 out_of_bound_opt='loop', test_mode=False,
                 start_index=None, keep_tail_frames=False):
        self.clip_len = clip_len
        self.frame_interval = frame_interval
        self.num_clips = num_clips
        self.temporal_jitter = temporal_jitter
        self.twice_sample = twice_sample
        self.out_of_bound_opt = out_of_bound_opt
        self.test_mode = test_mode
        self.keep_tail_frames = keep_tail_frames
        assert self.out_of_bound_opt in ('loop', 'repeat_last')

    def _sample_clips(self, num_frames):
        if self.test_mode:
            return _sample_test_offsets(num_frames, self.clip_len,
                                        self.frame_interval, self.num_clips,
                                        self.twice_sample)
        return _sample_train_offsets(num_frames, self.clip_len,
                                     self.frame_interval, self.num_clips,
                                     self.keep_tail_frames)

    def __call__(self, results):
        total_frames = results['total_frames']
        clip_offsets = self._sample_clips(total_frames)
        frame_inds = expand_offsets_to_inds(
            clip_offsets, self.clip_len, self.frame_interval, total_frames,
            self.out_of_bound_opt, self.temporal_jitter)
        start_index = results['start_index']
        results['frame_inds'] = (frame_inds + start_index).astype(np.int64)
        results['clip_len'] = self.clip_len
        results['frame_interval'] = self.frame_interval
        results['num_clips'] = self.num_clips
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(clip_len={self.clip_len}, '
                f'frame_interval={self.frame_interval}, '
                f'num_clips={self.num_clips}, test_mode={self.test_mode})')


@PIPELINES.register_module()
class DenseSampleFrames(SampleFrames):
    """Dense sampling within a 64-frame window (mmaction DenseSampleFrames)."""

    def __init__(self, *args, sample_range=64, num_sample_positions=10,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.sample_range = sample_range
        self.num_sample_positions = num_sample_positions

    def _get_train_clips(self, num_frames):
        sample_position = max(1, 1 + num_frames - self.sample_range)
        interval = self.sample_range // self.num_clips
        start_idx = 0 if sample_position == 1 else np.random.randint(
            0, sample_position - 1)
        base_offsets = np.arange(self.num_clips) * interval
        return (base_offsets + start_idx) % num_frames

    def _get_test_clips(self, num_frames):
        sample_position = max(1, 1 + num_frames - self.sample_range)
        interval = self.sample_range // self.num_clips
        start_list = np.linspace(0, sample_position - 1,
                                 num=self.num_sample_positions, dtype=int)
        base_offsets = np.arange(self.num_clips) * interval
        clip_offsets = []
        for start_idx in start_list:
            clip_offsets.extend((base_offsets + start_idx) % num_frames)
        return np.array(clip_offsets)

    def _sample_clips(self, num_frames):
        if self.test_mode:
            return self._get_test_clips(num_frames)
        return self._get_train_clips(num_frames)


def _fmt_tmpl(tmpl, *args):
    """Filename templates appear in both % ('img_%05d.jpg') and
    str.format ('img_{:05}.jpg') styles across mm configs."""
    return tmpl % args if '%' in tmpl else tmpl.format(*args)


_IMREAD_RGB_DIRECT = hasattr(cv2, 'IMREAD_COLOR_RGB')


def read_image_shape(path):
    """(h, w) from a JPEG/PNG header without decoding (~30 us), or None
    if the format is unrecognized. Lets MoCoDecodePlan sample crop boxes
    BEFORE decode so LocalDecode can use reduced-scale JPEG decode."""
    try:
        with open(path, 'rb') as f:
            head = f.read(26)
            if head[:8] == b'\x89PNG\r\n\x1a\n':
                return (int.from_bytes(head[20:24], 'big'),
                        int.from_bytes(head[16:20], 'big'))
            if head[:2] != b'\xff\xd8':
                return None
            f.seek(2)
            while True:
                byte = f.read(1)
                if not byte:
                    return None
                if byte != b'\xff':
                    continue
                marker = f.read(1)
                while marker == b'\xff':
                    marker = f.read(1)
                if not marker:
                    return None
                m = marker[0]
                if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
                    continue
                seg = f.read(2)
                if len(seg) < 2:
                    return None
                length = int.from_bytes(seg, 'big')
                # SOF0..SOF15 minus DHT/JPG/DAC carry the frame dims
                if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                    data = f.read(5)
                    if len(data) < 5:
                        return None
                    return (int.from_bytes(data[1:3], 'big'),
                            int.from_bytes(data[3:5], 'big'))
                f.seek(length - 2, 1)
    except OSError:
        return None


def _imread_rgb(path, reduce=1):
    """Decode an image file to RGB uint8.

    Host-decode fast path (measured on the 1-core box, 256x340 jpeg):
    imdecode-from-memory with OpenCV>=4.10's IMREAD_COLOR_RGB skips both
    the imread dispatch overhead and the BGR->RGB copy (0.49 -> 0.45
    ms/frame, bit-identical output). ``reduce=2`` uses libjpeg's
    DCT-domain half-scale decode (0.35 ms/frame) — only requested by
    LocalDecode when a pre-sampled crop guarantees the half-res image
    still strictly downsamples to the pipeline's target size
    (IMREAD_REDUCED_COLOR_2 carries the BGR IMREAD_COLOR bit, so this
    path keeps the cvtColor)."""
    buf = np.fromfile(path, np.uint8)
    if buf.size == 0:
        raise FileNotFoundError(f'failed to read image: {path}')
    if reduce == 2:
        img = cv2.imdecode(buf, cv2.IMREAD_REDUCED_COLOR_2)
        if img is None:
            raise FileNotFoundError(f'failed to decode image: {path}')
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if _IMREAD_RGB_DIRECT:
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR_RGB)
        if img is None:
            raise FileNotFoundError(f'failed to decode image: {path}')
        return img
    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f'failed to decode image: {path}')
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


@PIPELINES.register_module()
class RawFrameDecode:
    """Load frames ``filename_tmpl % idx`` from ``frame_dir`` at
    ``frame_inds`` (mmaction RawFrameDecode, disk backend)."""

    def __init__(self, io_backend='disk', decoding_backend='cv2', **kwargs):
        assert io_backend == 'disk', 'only the disk backend is supported'
        self.io_backend = io_backend
        self.decoding_backend = decoding_backend

    def __call__(self, results):
        directory = results['frame_dir']
        filename_tmpl = results['filename_tmpl']
        modality = results['modality']
        if results['frame_inds'].ndim != 1:
            results['frame_inds'] = np.squeeze(results['frame_inds'])
        offset = results.get('offset', 0)
        imgs = []
        cache = {}
        for frame_idx in results['frame_inds']:
            frame_idx = int(frame_idx) + offset
            if modality == 'RGB':
                if frame_idx not in cache:
                    filepath = osp.join(directory,
                                        _fmt_tmpl(filename_tmpl, frame_idx))
                    cache[frame_idx] = _imread_rgb(filepath)
                imgs.append(cache[frame_idx].copy())
            elif modality == 'Flow':
                x_path = osp.join(directory,
                                  _fmt_tmpl(filename_tmpl, 'x', frame_idx))
                y_path = osp.join(directory,
                                  _fmt_tmpl(filename_tmpl, 'y', frame_idx))
                imgs.append(cv2.imread(x_path, cv2.IMREAD_GRAYSCALE))
                imgs.append(cv2.imread(y_path, cv2.IMREAD_GRAYSCALE))
            else:
                raise NotImplementedError(f'modality {modality}')
        results['imgs'] = imgs
        results['original_shape'] = imgs[0].shape[:2]
        results['img_shape'] = imgs[0].shape[:2]
        if 'gt_bboxes' in results:
            h, w = results['img_shape']
            scale_factor = np.array([w, h, w, h])
            results['gt_bboxes'] = (results['gt_bboxes'] *
                                    scale_factor).astype(np.float32)
            if 'proposals' in results and results['proposals'] is not None:
                results['proposals'] = (results['proposals'] *
                                        scale_factor).astype(np.float32)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(io_backend={self.io_backend})'


@PIPELINES.register_module()
class OpenCVInit:
    """Open a video file with cv2.VideoCapture (mmaction OpenCVInit)."""

    def __init__(self, io_backend='disk', **kwargs):
        assert io_backend == 'disk'

    def __call__(self, results):
        cap = cv2.VideoCapture(results['filename'])
        if not cap.isOpened():
            raise IOError(f'failed to open video: {results["filename"]}')
        results['video_reader'] = cap
        results['total_frames'] = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        return results


@PIPELINES.register_module()
class OpenCVDecode:
    """Decode frames at frame_inds from an opened cv2 capture."""

    def __call__(self, results):
        cap = results['video_reader']
        if results['frame_inds'].ndim != 1:
            results['frame_inds'] = np.squeeze(results['frame_inds'])
        frames = {}
        for idx in sorted(set(int(i) for i in results['frame_inds'])):
            cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            ret, frame = cap.read()
            if not ret:
                raise IOError(f'failed to decode frame {idx}')
            frames[idx] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        imgs = [frames[int(i)].copy() for i in results['frame_inds']]
        cap.release()
        del results['video_reader']
        results['imgs'] = imgs
        results['original_shape'] = imgs[0].shape[:2]
        results['img_shape'] = imgs[0].shape[:2]
        return results


def _load_flow_blob(path):
    """Raw float flow (H, W, 2) from .np4 (lz4+msgpack) or .npy."""
    if path.endswith('.npy'):
        return np.load(path)
    with open(path, 'rb') as f:
        buf = f.read()
    arr = np4_decode(buf)
    if arr is None:
        raise IOError(f'failed to decode flow blob: {path}')
    return arr


@PIPELINES.register_module()
class LocalDecode:
    """Filesystem equivalent of NoriDecode (reference loading.py:1812-1914).

    Reads, at every index in ``frame_inds``:
      - ``img_paths``       -> ``imgs``       (JPEG/PNG, RGB)
      - ``flow_img_paths``  -> ``flow_imgs``  (JPEG/PNG flow visualizations)
      - ``flow_paths``      -> ``flows``      (raw float flow, np4/npy)
      - ``gt_bboxes``       -> per-frame boxes, rescaled to pixel coords
    """
    im_keys = ('img_paths', 'flow_img_paths')
    flow_keys = ('flow_paths',)
    key_map = {'img_paths': 'imgs', 'flow_img_paths': 'flow_imgs',
               'flow_paths': 'flows'}

    def __call__(self, results):
        if results['frame_inds'].ndim != 1:
            results['frame_inds'] = np.squeeze(results['frame_inds'])
        offset = results.get('offset', 0)
        inds = [int(i) + offset for i in results['frame_inds']]
        plan = results.get('moco_plan')
        for im_key in self.im_keys:
            if im_key in results:
                paths = results[im_key]
                if plan is not None and im_key == 'img_paths':
                    results['imgs'] = self._decode_planned(paths, inds,
                                                           results, plan)
                    continue
                results[self.key_map[im_key]] = [
                    _imread_rgb(paths[i]) for i in inds]
        for flow_key in self.flow_keys:
            if flow_key in results:
                paths = results[flow_key]
                results[self.key_map[flow_key]] = [
                    _load_flow_blob(paths[i]) for i in inds]
        if 'gt_bboxes' in results:
            boxes = results['gt_bboxes']
            results['gt_bboxes'] = ([boxes[i] for i in inds]
                                    if len(boxes) else np.zeros((0, 4)))
        imgs = results['imgs']
        results['original_shape'] = imgs[0].shape[:2]
        results['img_shape'] = imgs[0].shape[:2]
        if 'gt_bboxes' in results and len(results['gt_bboxes']):
            h, w = results['img_shape']
            scale = np.array([w, h, w, h])
            results['gt_bboxes'] = [
                (b * scale).astype(np.float32) for b in results['gt_bboxes']]
        return results

    def _decode_planned(self, paths, inds, results, plan):
        """Decode the q/k halves at the per-half reduce factor chosen by
        MoCoDecodePlan (half-scale libjpeg decode when that half's
        pre-sampled crop still strictly downsamples to the target).
        Records the per-half decoded shapes for the crop op."""
        n = len(inds)
        if results.get('clip_len') == n:
            # single clip shared by q and k: reduce only if BOTH allow
            f = min(plan['reduce_q'], plan['reduce_k'])
            imgs = [_imread_rgb(paths[i], f) for i in inds]
        else:
            h = n // 2
            imgs = ([_imread_rgb(paths[i], plan['reduce_q'])
                     for i in inds[:h]] +
                    [_imread_rgb(paths[i], plan['reduce_k'])
                     for i in inds[h:]])
        results['img_shape_dec_q'] = imgs[0].shape[:2]
        results['img_shape_dec_k'] = imgs[-1].shape[:2]
        return imgs

    def __repr__(self):
        return f'{self.__class__.__name__}()'


# NoriDecode is accepted as a config alias so reference configs load
# unchanged; it decodes from the local filesystem.
PIPELINES.register_module(name='NoriDecode', module=LocalDecode)


@PIPELINES.register_module()
class ArrayDecode:
    """Pick frames from an in-memory ``array`` (T, H, W, C) at frame_inds —
    used by tests and synthetic benchmarks."""

    def __call__(self, results):
        if results['frame_inds'].ndim != 1:
            results['frame_inds'] = np.squeeze(results['frame_inds'])
        array = results['array']
        imgs = [array[int(i)].copy() for i in results['frame_inds']]
        results['imgs'] = imgs
        results['original_shape'] = imgs[0].shape[:2]
        results['img_shape'] = imgs[0].shape[:2]
        if 'flow_array' in results:
            results['flows'] = [results['flow_array'][int(i)].copy()
                                for i in results['frame_inds']]
        return results


@PIPELINES.register_module()
class LoadLocalizationFeature:
    """Reference-config compatibility (reference pipelines/loading.py
    LoadLocalizationFeature): ActivityNetDataset here loads and
    temporally resizes ``raw_feature`` in prepare_* (the TPU-native data
    plane keeps IO in the dataset); this transform validates/casts."""

    def __init__(self, raw_feature_ext='.csv', **kwargs):
        self.raw_feature_ext = raw_feature_ext

    def __call__(self, results):
        assert 'raw_feature' in results, (
            'LoadLocalizationFeature expects the dataset to provide '
            'raw_feature (ActivityNetDataset.prepare_train_frames)')
        results['raw_feature'] = np.asarray(results['raw_feature'],
                                            np.float32)
        return results


@PIPELINES.register_module()
class GenerateLocalizationLabels:
    """Reference-config compatibility: normalized gt segments are
    produced by ActivityNetDataset (gt_bbox); validate presence."""

    def __call__(self, results):
        assert 'gt_bbox' in results
        results['gt_bbox'] = np.asarray(results['gt_bbox'], np.float32)
        return results


# Reference-config compatibility: decord / PyAV are not available in
# this environment; their Init/Decode transforms map onto the cv2
# video backend (same results-dict contract: filename -> video_reader
# -> imgs at frame_inds). Reference: loading.py Decord*/PyAV* classes.
@PIPELINES.register_module()
class DecordInit(OpenCVInit):
    def __init__(self, io_backend='disk', num_threads=1, **kwargs):
        super().__init__(io_backend=io_backend)


@PIPELINES.register_module()
class DecordDecode(OpenCVDecode):
    def __init__(self, mode='accurate', **kwargs):
        super().__init__()


@PIPELINES.register_module()
class PyAVInit(OpenCVInit):
    def __init__(self, io_backend='disk', **kwargs):
        super().__init__(io_backend=io_backend)


@PIPELINES.register_module()
class PyAVDecode(OpenCVDecode):
    def __init__(self, multi_thread=False, **kwargs):
        super().__init__()


@PIPELINES.register_module()
class PIMSInit(OpenCVInit):
    """pims is not available in this environment; maps onto the cv2
    video backend (reference loading.py PIMSInit)."""

    def __init__(self, io_backend='disk', mode='accurate', **kwargs):
        super().__init__(io_backend=io_backend)


@PIPELINES.register_module()
class PIMSDecode(OpenCVDecode):
    """cv2-backed PIMSDecode equivalent (reference loading.py)."""


@PIPELINES.register_module()
class PyAVDecodeMotionVector:
    """Codec motion vectors require PyAV's side-data API, which has no
    cv2 equivalent; raise with guidance (reference loading.py
    PyAVDecodeMotionVector). RAFT/TVL1 extraction
    (tools/misc/flow_extraction.py) is the supported motion source."""

    def __call__(self, results):
        raise NotImplementedError(
            'PyAVDecodeMotionVector needs the PyAV codec side-data API '
            '(not available here); use tools/misc/flow_extraction.py '
            'for optical flow instead')


@PIPELINES.register_module()
class UntrimmedSampleFrames:
    """Evenly sample clip centers every ``frame_interval`` frames over an
    untrimmed video (reference loading.py UntrimmedSampleFrames):
    centers at frame_interval//2 + k*frame_interval, each expanded to
    clip_len frames clipped to the valid range."""

    def __init__(self, clip_len=1, frame_interval=16, start_index=None):
        self.clip_len = clip_len
        self.frame_interval = frame_interval
        self.start_index = start_index

    def __call__(self, results):
        total_frames = results['total_frames']
        start_index = self.start_index if self.start_index is not None \
            else results.get('start_index', 0)
        clip_centers = np.arange(self.frame_interval // 2, total_frames,
                                 self.frame_interval)
        num_clips = clip_centers.shape[0]
        frame_inds = clip_centers[:, None] + np.arange(
            -(self.clip_len // 2),
            self.clip_len - (self.clip_len // 2))[None, :]
        frame_inds = np.clip(frame_inds, 0, total_frames - 1)
        results['frame_inds'] = (np.concatenate(frame_inds) +
                                 start_index).astype(np.int64)
        results['clip_len'] = self.clip_len
        results['frame_interval'] = self.frame_interval
        results['num_clips'] = num_clips
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(clip_len={self.clip_len}, '
                f'frame_interval={self.frame_interval})')


@PIPELINES.register_module()
class LoadProposals:
    """Load top-k PGM proposals + BSP features for BSN-PEM training
    (reference loading.py LoadProposals; columns follow the PGM csv:
    tmin, tmax, tmin_score, tmax_score, score, match_iou — produced
    by mscl_tpu/localization/bsn_utils.py)."""

    def __init__(self, top_k, pgm_proposals_dir, pgm_features_dir,
                 proposal_ext='.csv', feature_ext='.npy'):
        if proposal_ext != '.csv' or feature_ext != '.npy':
            raise NotImplementedError(
                f'ext {proposal_ext}/{feature_ext} not supported')
        self.top_k = top_k
        self.pgm_proposals_dir = pgm_proposals_dir
        self.pgm_features_dir = pgm_features_dir
        self.proposal_ext = proposal_ext
        self.feature_ext = feature_ext

    def __call__(self, results):
        video_name = results['video_name']
        proposals = np.loadtxt(
            osp.join(self.pgm_proposals_dir,
                     video_name + self.proposal_ext),
            dtype=np.float32, delimiter=',', skiprows=1)
        proposals = np.array(proposals[:self.top_k])
        results['tmin'] = proposals[:, 0]
        results['tmax'] = proposals[:, 1]
        results['tmin_score'] = proposals[:, 2]
        results['tmax_score'] = proposals[:, 3]
        results['reference_temporal_iou'] = proposals[:, 5]
        feature = np.load(
            osp.join(self.pgm_features_dir,
                     video_name + self.feature_ext)).astype(np.float32)
        results['bsp_feature'] = feature[:self.top_k, :]
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(top_k={self.top_k})'


@PIPELINES.register_module()
class LoadHVULabel:
    """Convert the HVU per-category tag dict into flat one-hot label +
    tag/category masks (reference loading.py LoadHVULabel)."""

    def __init__(self, **kwargs):
        self.hvu_initialized = False

    def init_hvu_info(self, categories, category_nums):
        self.categories = list(categories)
        self.category_nums = list(category_nums)
        self.num_categories = len(categories)
        self.num_tags = sum(category_nums)
        self.category2num = dict(zip(categories, category_nums))
        start_idx = [0]
        for num in self.category_nums[:-1]:
            start_idx.append(start_idx[-1] + num)
        self.category2startidx = dict(zip(categories, start_idx))
        self.hvu_initialized = True

    def __call__(self, results):
        if not self.hvu_initialized:
            self.init_hvu_info(results['categories'],
                               results['category_nums'])
        onehot = np.zeros(self.num_tags, np.float32)
        onehot_mask = np.zeros(self.num_tags, np.float32)
        category_mask = np.zeros(self.num_categories, np.float32)
        for category, tags in results['label'].items():
            category_mask[self.categories.index(category)] = 1.0
            start = self.category2startidx[category]
            num = self.category2num[category]
            onehot[[start + t for t in tags]] = 1.0
            onehot_mask[start:start + num] = 1.0
        results['label'] = onehot
        results['mask'] = onehot_mask
        results['category_mask'] = category_mask
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}()'


@PIPELINES.register_module()
class ImageDecode:
    """Load and decode single images from ``filename`` (reference
    loading.py ImageDecode; ImageDataset pipelines)."""

    def __init__(self, io_backend='disk', decoding_backend='cv2',
                 **kwargs):
        self.io_backend = io_backend
        self.decoding_backend = decoding_backend

    def __call__(self, results):
        img = cv2.imread(results['filename'], cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(results['filename'])
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        results['imgs'] = [img]
        results['original_shape'] = img.shape[:2]
        results['img_shape'] = img.shape[:2]
        return results


@PIPELINES.register_module()
class BuildPseudoClip:
    """Repeat a single frame into a ``clip_len``-frame pseudo clip
    (reference loading.py BuildPseudoClip)."""

    def __init__(self, clip_len):
        self.clip_len = clip_len

    def __call__(self, results):
        im = results['imgs'][0]
        results['imgs'] = [np.copy(im) for _ in range(self.clip_len)]
        results['clip_len'] = self.clip_len
        results['num_clips'] = 1
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(clip_len={self.clip_len})'
