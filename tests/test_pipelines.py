"""Pipeline transform tests — mirror the reference math on synthetic
results dicts (reference test style: tests/test_data/test_pipelines/*)."""
import numpy as np
import pytest

from mscl_tpu.datasets.builder import PIPELINES
from mscl_tpu.datasets.pipelines import (
    CenterCrop, ChosenSampleFrames, Collect, Compose, Flip, FormatShape,
    MatchFlow, MoCoNormalize, MoCoRandomResizedCrop, MoCoResize, Normalize,
    NormFlowWithStidedAug, RandomResizedCrop, Resize, SampleFrames, Seg2T,
    TemporalShiftChosenSampleFrames, ToTensor, norm_flow)
from mscl_tpu.utils.flow_viz import flow_to_image


def make_imgs(n, h=32, w=48, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            .astype(np.uint8) for _ in range(n)]


class TestSampleFrames:

    def test_train_basic(self):
        np.random.seed(0)
        results = dict(total_frames=64, start_index=0)
        t = SampleFrames(clip_len=8, frame_interval=2, num_clips=1)
        out = t(results)
        assert out['frame_inds'].shape == (8,)
        assert out['clip_len'] == 8 and out['num_clips'] == 1
        # consecutive stride-2 window
        diffs = np.diff(out['frame_inds'])
        assert np.all(diffs == 2)
        assert out['frame_inds'].max() < 64

    def test_test_mode_deterministic(self):
        results = dict(total_frames=100, start_index=0)
        t = SampleFrames(clip_len=1, frame_interval=1, num_clips=16,
                         test_mode=True)
        out1 = t(dict(results))
        out2 = t(dict(results))
        assert np.array_equal(out1['frame_inds'], out2['frame_inds'])
        assert len(out1['frame_inds']) == 16

    def test_short_video_loops(self):
        np.random.seed(0)
        results = dict(total_frames=5, start_index=0)
        t = SampleFrames(clip_len=8, frame_interval=2, num_clips=1)
        out = t(results)
        assert out['frame_inds'].max() < 5  # looped into range


class TestMDS:

    def test_chosen_sample_frames_lands_in_chosen(self):
        np.random.seed(3)
        chosen = [4, 12, 20]
        t = ChosenSampleFrames(clip_len=4, frame_interval=1, num_clips=1)
        for _ in range(20):
            results = dict(total_frames=40, start_index=0,
                           chosen_idx=list(chosen))
            out = t(results)
            # after <=10 rejection attempts offset is in chosen or falls
            # back to chosen[0]
            assert out['frame_inds'][0] in chosen

    def test_chosen_fallback_empty(self):
        np.random.seed(0)
        t = ChosenSampleFrames(clip_len=4, frame_interval=1, num_clips=1)
        results = dict(total_frames=40, start_index=0, chosen_idx=[])
        out = t(results)
        assert out['frame_inds'][0] == 0

    def test_temporal_shift_pair(self):
        np.random.seed(5)
        chosen = [0, 8, 16, 24]
        t = TemporalShiftChosenSampleFrames(
            clip_len=8, frame_interval=1, num_clips=1, shift_range=1)
        results = dict(total_frames=64, start_index=0,
                       chosen_idx=list(chosen))
        out = t(results)
        assert out['num_clips'] == 2
        assert len(out['frame_inds']) == 16
        q_start = out['frame_inds'][0]
        k_start = out['frame_inds'][8]
        assert q_start in chosen
        assert k_start in chosen  # snapped to nearest chosen
        # shift bounded by shift_range*clip_len*frame_interval + snap dist
        assert abs(int(k_start) - int(q_start)) <= 8 + 24


class TestMatchFlow:

    def test_geometry(self):
        # 24 frames, gap=2 adjacent=8 -> (24-8)//2 = 8 flow-aligned frames
        paths = [f'f{i}.jpg' for i in range(24)]
        flows = [f'fl{i}.np4' for i in range(8)]
        results = dict(img_paths=paths, flow_paths=flows)
        t = MatchFlow(gap=2, adjacent=8, flow_key='nids_flow')
        out = t(results)
        assert out['total_frames'] == 8
        assert out['img_paths'] == [paths[i] for i in range(0, 16, 2)]


class TestFRA:

    def test_norm_flow_unit_radius(self):
        rng = np.random.default_rng(0)
        flow = rng.normal(size=(8, 8, 2)).astype(np.float32) * 5
        normed = norm_flow(flow)
        rad = np.sqrt((normed ** 2).sum(-1))
        assert rad.max() <= 1.0 + 1e-5
        # direction preserved
        ratio = normed[..., 0] / (flow[..., 0] + 1e-12)
        assert np.allclose(ratio, ratio.flat[0], rtol=1e-3)

    def test_strided_aug_rotation_exact(self):
        np.random.seed(1)
        flow = np.zeros((4, 4, 2), dtype=np.float64)
        flow[..., 0] = 1.0  # unit flow pointing +u
        t = NormFlowWithStidedAug(ratios=(0.2, 1.8), num_chunks=8,
                                  merge_aug=True)
        results = dict(flows=[flow.copy()])
        out = t(results)
        assert len(out['flow_imgs']) == 2  # base + rotated
        cid = out['ap_labels']
        assert 0 <= cid < 8
        beta = (0.2 + 0.2 * cid) * np.pi
        rotated = out['flow_imgs'][1]
        # base flow normalized to unit radius; rotated must match
        # (cos b, sin b) / (1 + eps)
        expect_u = np.cos(beta) / (1 + 1e-5)
        expect_v = np.sin(beta) / (1 + 1e-5)
        assert np.allclose(rotated[..., 0], expect_u, atol=1e-6)
        assert np.allclose(rotated[..., 1], expect_v, atol=1e-6)
        assert 'flows' not in out

    def test_merge_false(self):
        np.random.seed(2)
        flow = np.random.randn(4, 4, 2)
        t = NormFlowWithStidedAug(ratios=(0.2, 1.8), num_chunks=8,
                                  merge_aug=False)
        out = t(dict(flows=[flow]))
        assert len(out['flow_imgs']) == 1
        assert len(out['rotated_flow_imgs']) == 1

    def test_batched_helpers_match_per_frame_reference(self):
        """The vectorized clip-level helpers must reproduce the scalar
        reference functions: norm bit-identically, f32 rotate within the
        documented <=2.5e-6 absolute envelope (the per-frame path
        promotes to f64), f64 rotate bit-identically."""
        from mscl_tpu.datasets.pipelines.transforms_motion import (
            _norm_flow_frames, _rotate_flow_frames, rotate_flow)
        rng = np.random.default_rng(0)
        beta = 0.7345
        for dtype, rot_exact in ((np.float32, False), (np.float64, True)):
            flows = (rng.normal(size=(5, 17, 23, 2)) * 7).astype(dtype)
            got_n = _norm_flow_frames(np.stack(list(flows)))
            for i in range(5):
                np.testing.assert_array_equal(got_n[i],
                                              norm_flow(flows[i]))
            got_r = _rotate_flow_frames(flows.copy(), beta)
            for i in range(5):
                ref = rotate_flow(flows[i], beta)
                if rot_exact:
                    np.testing.assert_array_equal(got_r[i], ref)
                else:
                    np.testing.assert_allclose(got_r[i], ref, atol=3e-6)

    def test_moco_normalize_fused_divide_bit_identical(self):
        imgs_q = make_imgs(4, seed=3)
        imgs_k = make_imgs(4, seed=4)
        out = MoCoNormalize()(dict(imgs=[list(imgs_q), list(imgs_k)]))
        for idx, frames in enumerate((imgs_q, imgs_k)):
            ref = (np.stack(frames).astype(np.float32) / 255.0
                   ).transpose((3, 0, 1, 2))
            np.testing.assert_array_equal(out['imgs'][idx], ref)


class TestFlowViz:

    def test_flow_to_image_shape_and_known_colors(self):
        flow = np.zeros((4, 4, 2), dtype=np.float32)
        img = flow_to_image(flow)
        assert img.shape == (4, 4, 3) and img.dtype == np.uint8
        # zero flow -> radius 0 -> white (255)
        assert np.all(img == 255)

    def test_directional_colors_differ(self):
        f1 = np.zeros((2, 2, 2), np.float32)
        f1[..., 0] = 1
        f2 = np.zeros((2, 2, 2), np.float32)
        f2[..., 1] = 1
        assert not np.array_equal(flow_to_image(f1), flow_to_image(f2))


class TestMoCoCrop:

    def _results(self):
        return dict(
            imgs=make_imgs(16, 64, 96),
            flow_imgs=[np.random.default_rng(7).normal(
                size=(32, 48, 2)).astype(np.float32) for _ in range(16)],
            img_shape=(64, 96),
            clip_len=8, num_clips=2)

    def test_paired_crop_splits_and_scales_flow(self):
        np.random.seed(0)
        t = MoCoRandomResizedCrop(area_range=(0.2, 1.0),
                                  flow_key='flow_imgs')
        out = t(self._results())
        assert 'imgs_q' in out and 'imgs_k' in out
        assert len(out['imgs_q']) == 8 and len(out['imgs_k']) == 8
        assert len(out['flow_imgs_q']) == 8
        # flow crop is the image crop at half resolution
        l, tp, r, b = out['crop_bbox_q']
        fh, fw = out['flow_imgs_q'][0].shape[:2]
        assert fh == int(round(b * 0.5)) - int(round(tp * 0.5))
        assert fw == int(round(r * 0.5)) - int(round(l * 0.5))

    def test_resize_and_normalize_chain(self):
        np.random.seed(0)
        results = self._results()
        chain = Compose([
            MoCoRandomResizedCrop(area_range=(0.2, 1.0),
                                  flow_key='flow_imgs'),
            MoCoResize(scale=(32, 32), keep_ratio=False,
                       flow_key='flow_imgs', suffix='_q'),
            MoCoResize(scale=(32, 32), keep_ratio=False,
                       flow_key='flow_imgs', suffix='_k'),
            MoCoNormalize(ori_flow=True),
        ])
        out = chain(results)
        assert isinstance(out['imgs'], list) and len(out['imgs']) == 2
        # CTHW, /255
        assert out['imgs'][0].shape == (3, 8, 32, 32)
        assert out['imgs'][0].max() <= 1.0
        assert out['flow_imgs'][0].shape == (2, 8, 32, 32)
        # ori_flow=True: flow NOT divided by 255 (raw normalized flow)
        assert out['flow_imgs'][0].min() < 0 or \
            out['flow_imgs'][0].max() > 1.0 / 255


class TestBasicAugs:

    def test_resize_keep_ratio(self):
        results = dict(imgs=make_imgs(2, 32, 64), img_shape=(32, 64),
                       modality='RGB')
        # short edge -> 128, aspect preserved (mmcv.rescale_size semantics)
        out = Resize(scale=(-1, 128))(results)
        assert out['img_shape'] == (128, 256)
        assert out['imgs'][0].shape == (128, 256, 3)

    def test_resize_fixed(self):
        results = dict(imgs=make_imgs(2, 32, 64), img_shape=(32, 64),
                       modality='RGB')
        out = Resize(scale=(112, 112), keep_ratio=False)(results)
        assert out['imgs'][0].shape == (112, 112, 3)

    def test_center_crop(self):
        results = dict(imgs=make_imgs(2, 64, 64), img_shape=(64, 64),
                       modality='RGB')
        out = CenterCrop(crop_size=32)(results)
        assert out['img_shape'] == (32, 32)
        assert list(out['crop_bbox']) == [16, 16, 48, 48]

    def test_random_resized_crop_range(self):
        np.random.seed(0)
        for _ in range(10):
            results = dict(imgs=make_imgs(1, 64, 64), img_shape=(64, 64),
                           modality='RGB')
            out = RandomResizedCrop(area_range=(0.25, 1.0))(results)
            h, w = out['img_shape']
            assert h * w >= 0.2 * 64 * 64 * 0.7  # loose lower bound

    def test_flip_flow_modality_inverts_x(self):
        np.random.seed(0)
        imgs = [np.full((4, 4), 10, np.uint8), np.full((4, 4), 20, np.uint8)]
        results = dict(imgs=imgs, img_shape=(4, 4), modality='Flow')
        out = Flip(flip_ratio=1.0)(results)
        assert np.all(out['imgs'][0] == 245)  # x-flow inverted
        assert np.all(out['imgs'][1] == 20)   # y-flow not

    def test_normalize_rgb(self):
        results = dict(imgs=make_imgs(2, 8, 8), modality='RGB',
                       img_shape=(8, 8))
        mean = [123.675, 116.28, 103.53]
        std = [58.395, 57.12, 57.375]
        out = Normalize(mean=mean, std=std)(results)
        assert out['imgs'].dtype == np.float32
        assert abs(out['imgs'].mean()) < 3


class TestFormatting:

    def test_seg2t(self):
        imgs = np.random.rand(16, 8, 8, 3).astype(np.float32)
        results = dict(imgs=imgs, num_clips=16, clip_len=1)
        out = Seg2T()(results)
        # leading dim = N_crops (reference loading_mscl.py:95-97)
        assert out['imgs'].shape == (1, 3, 16, 8, 8)
        assert out['clip_len'] == 16 and out['num_clips'] == 1

    def test_format_shape_ncthw(self):
        imgs = np.random.rand(8, 4, 4, 3).astype(np.float32)
        results = dict(imgs=imgs, num_clips=1, clip_len=8)
        out = FormatShape('NCTHW')(results)
        assert out['imgs'].shape == (1, 3, 8, 4, 4)

    def test_format_shape_nthwc(self):
        imgs = np.random.rand(8, 4, 4, 3).astype(np.float32)
        results = dict(imgs=imgs, num_clips=1, clip_len=8)
        out = FormatShape('NTHWC')(results)
        assert out['imgs'].shape == (1, 8, 4, 4, 3)

    def test_collect_and_totensor(self):
        results = dict(imgs=np.zeros((2, 2)), label=3, junk='x')
        out = Collect(keys=['imgs', 'label'], meta_keys=[])(results)
        assert set(out) == {'imgs', 'label'}
        out = ToTensor(keys=['imgs', 'label'])(out)
        assert out['label'].dtype == np.int64

    def test_totensor_batched(self):
        results = dict(imgs=[np.zeros((2, 2)), np.ones((2, 2))])
        out = ToTensor(keys=['imgs'], batched=True)(results)
        assert isinstance(out['imgs'], list) and len(out['imgs']) == 2


class TestRegistryCompleteness:

    def test_mscl_train_pipeline_builds(self):
        """The headline config's pipeline types all resolve
        (mscl_r18_cosm_lr2e-2.py:66-77)."""
        for t in ['MatchFlow', 'TemporalShiftChosenSampleFrames',
                  'NoriDecode', 'NormFlowWithStidedAug',
                  'MoCoRandomResizedCrop', 'MoCoResize', 'MoCoNormalize',
                  'Collect', 'ToTensor']:
            assert t in PIPELINES, f'{t} missing from PIPELINES'

    def test_finetune_pipeline_builds(self):
        for t in ['SampleFrames', 'Resize', 'RandomResizedCrop',
                  'Normalize', 'Seg2T', 'CenterCrop']:
            assert t in PIPELINES, f'{t} missing from PIPELINES'


class TestLazyOps:
    """Lazy crop/resize/flip accumulation + Fuse (reference
    augmentations.py:24-55, 511-549): geometry-only recording, one
    fused crop+resize+flip application."""

    def _imgs(self, h=64, w=80, n=3):
        rng = np.random.default_rng(0)
        return [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                for _ in range(n)]

    def test_lazy_matches_eager(self):
        from mscl_tpu.datasets.pipelines.augmentations import (
            CenterCrop, Flip, Fuse, Resize)
        imgs = self._imgs()

        def run(lazy):
            r = dict(imgs=[i.copy() for i in imgs], img_shape=(64, 80))
            r = CenterCrop(32, lazy=lazy)(r)
            r = Resize((48, 48), keep_ratio=False, lazy=lazy)(r)
            r = Flip(flip_ratio=1.0, lazy=lazy)(r)
            return Fuse()(r) if lazy else r

        eager, lazy = run(False), run(True)
        assert lazy['img_shape'] == eager['img_shape'] == (48, 48)
        assert 'lazy' not in lazy
        for a, b in zip(eager['imgs'], lazy['imgs']):
            # one fused interpolation vs two chained ones
            assert np.mean(np.abs(a.astype(float) - b.astype(float))) < 2

    def test_lazy_crop_composes(self):
        from mscl_tpu.datasets.pipelines.augmentations import (
            CenterCrop, Fuse)
        imgs = self._imgs()
        r = dict(imgs=[i.copy() for i in imgs], img_shape=(64, 80))
        r = CenterCrop(48, lazy=True)(r)
        r = CenterCrop(24, lazy=True)(r)
        np.testing.assert_allclose(r['lazy']['crop_bbox'],
                                   [28, 20, 52, 44])
        r = Fuse()(r)
        ref = imgs[0][20:44, 28:52]
        np.testing.assert_array_equal(r['imgs'][0], ref)

    def test_non_lazy_after_lazy_raises(self):
        from mscl_tpu.datasets.pipelines.augmentations import CenterCrop
        r = dict(imgs=self._imgs(), img_shape=(64, 80))
        r = CenterCrop(48, lazy=True)(r)
        with pytest.raises(AssertionError, match='Fuse'):
            CenterCrop(24, lazy=False)(r)

    def test_fuse_without_lazy_raises(self):
        from mscl_tpu.datasets.pipelines.augmentations import Fuse
        with pytest.raises(ValueError):
            Fuse()(dict(imgs=self._imgs()))


class TestMoCoDecodePlan:
    """Crop-region-aware reduced decode (MoCoDecodePlan + LocalDecode +
    MoCoRandomResizedCrop presampled path)."""

    def _write_frames(self, tmp_path, n=16, hw=(64, 96)):
        import cv2
        rng = np.random.default_rng(3)
        paths = []
        for i in range(n):
            img = (rng.normal(size=(hw[0] // 8, hw[1] // 8, 3)) * 40 +
                   128).clip(0, 255).astype(np.uint8)
            img = cv2.resize(img, (hw[1], hw[0]),
                             interpolation=cv2.INTER_CUBIC)
            p = str(tmp_path / f'img_{i:05d}.jpg')
            cv2.imwrite(p, img)
            paths.append(p)
        return paths

    def _results(self, paths):
        return dict(img_paths=paths,
                    frame_inds=np.arange(len(paths)),
                    clip_len=len(paths) // 2, num_clips=2)

    def test_read_image_shape_jpeg_png(self, tmp_path):
        import cv2

        from mscl_tpu.datasets.pipelines.loading import read_image_shape
        img = np.random.default_rng(0).integers(
            0, 256, size=(47, 83, 3)).astype(np.uint8)
        for ext in ('.jpg', '.png'):
            p = str(tmp_path / ('x' + ext))
            cv2.imwrite(p, img)
            assert read_image_shape(p) == (47, 83)
        bad = str(tmp_path / 'bad.jpg')
        with open(bad, 'wb') as f:
            f.write(b'notanimage')
        assert read_image_shape(bad) is None

    def test_imread_rgb_direct_bitwise(self, tmp_path):
        import cv2

        from mscl_tpu.datasets.pipelines.loading import _imread_rgb
        p = self._write_frames(tmp_path, n=1)[0]
        ref = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(_imread_rgb(p), ref)

    def test_plan_noreduce_bitwise_equal_to_baseline(self, tmp_path):
        """With reduce gated off (target too large to ever halve), the
        planned pipeline must be BITWISE identical to the baseline —
        same sampler, same crops, full-res decode."""
        import random

        from mscl_tpu.datasets.pipelines import (LocalDecode,
                                                 MoCoDecodePlan)
        paths = self._write_frames(tmp_path)
        flows = [np.random.default_rng(11).normal(
            size=(32, 48, 2)).astype(np.float32) for _ in range(16)]
        crop = MoCoRandomResizedCrop(area_range=(0.2, 1.0),
                                     flow_key='flow_imgs')

        np.random.seed(5)
        random.seed(5)
        base = LocalDecode()(self._results(paths))
        base['flow_imgs'] = [f.copy() for f in flows]
        base = crop(base)

        np.random.seed(5)
        random.seed(5)
        r = MoCoDecodePlan(target=(64, 96),
                           area_range=(0.2, 1.0))(self._results(paths))
        assert r['moco_plan']['reduce_q'] == 1
        assert r['moco_plan']['reduce_k'] == 1
        r = LocalDecode()(r)
        r['flow_imgs'] = [f.copy() for f in flows]
        r = crop(r)

        for k in ('crop_bbox_q', 'crop_bbox_k'):
            np.testing.assert_array_equal(r[k], base[k])
        for k in ('imgs_q', 'imgs_k', 'flow_imgs_q', 'flow_imgs_k'):
            assert len(r[k]) == len(base[k])
            for a, b in zip(r[k], base[k]):
                np.testing.assert_array_equal(a, b)

    def test_plan_reduced_halves_and_flow_exact(self, tmp_path):
        """Near-full crops + small target force reduce=2 on both halves:
        imgs decode at half scale (crop dims halve), the flow replay
        stays bitwise identical to the full-res pipeline, and the final
        resized output matches the baseline closely."""
        import random

        from mscl_tpu.datasets.pipelines import (LocalDecode,
                                                 MoCoDecodePlan)
        paths = self._write_frames(tmp_path)
        flows = [np.random.default_rng(11).normal(
            size=(32, 48, 2)).astype(np.float32) for _ in range(16)]
        crop = MoCoRandomResizedCrop(area_range=(0.95, 1.0),
                                     flow_key='flow_imgs')
        resize = Compose([
            MoCoResize(scale=(24, 24), keep_ratio=False,
                       flow_key='flow_imgs', suffix='_q'),
            MoCoResize(scale=(24, 24), keep_ratio=False,
                       flow_key='flow_imgs', suffix='_k')])

        np.random.seed(9)
        random.seed(9)
        base = LocalDecode()(self._results(paths))
        base['flow_imgs'] = [f.copy() for f in flows]
        base = resize(crop(base))

        np.random.seed(9)
        random.seed(9)
        r = MoCoDecodePlan(target=(24, 24),
                           area_range=(0.95, 1.0))(self._results(paths))
        plan = dict(r['moco_plan'])
        assert plan['reduce_q'] == 2 and plan['reduce_k'] == 2
        r = LocalDecode()(r)
        assert r['img_shape_dec_q'] == (32, 48)
        r['flow_imgs'] = [f.copy() for f in flows]
        r = resize(crop(r))

        # same full-res crop boxes were used (plan['crop_q'] == baseline
        # sample), so the flow replay is bitwise identical
        l, t, rr, b = plan['crop_q']
        np.testing.assert_array_equal(base['crop_bbox_q'], [l, t, rr, b])
        for a, bb in zip(r['flow_imgs'][0], base['flow_imgs'][0]):
            np.testing.assert_array_equal(a, bb)
        # imgs: same content through a half-scale decode -> close, not
        # bitwise; both are (24, 24) crops of the same region
        for a, bb in zip(r['imgs'][0], base['imgs'][0]):
            assert a.shape == bb.shape == (24, 24, 3)
            diff = np.abs(a.astype(np.float32) - bb.astype(np.float32))
            assert diff.mean() < 12.0

    def test_single_clip_shared_frames_uses_min_factor(self, tmp_path):
        from mscl_tpu.datasets.pipelines import LocalDecode, MoCoDecodePlan
        paths = self._write_frames(tmp_path, n=8)
        r = self._results(paths)
        r['clip_len'] = 8        # q and k share the one clip
        r = MoCoDecodePlan(target=(24, 24),
                           area_range=(0.95, 1.0))(r)
        r['moco_plan']['reduce_k'] = 1      # force a q/k disagreement
        r = LocalDecode()(r)
        # shared frames: reduction only if BOTH halves allow it
        assert r['imgs'][0].shape[:2] == (64, 96)

    def test_recipe_pipeline_with_plan_builds_and_runs(self, tmp_path):
        """The full flagship train_pipeline (with MoCoDecodePlan) over
        real on-disk jpegs + np4 flows produces the recipe shapes."""
        from mscl_tpu.config import Config
        from mscl_tpu.utils.np4 import np4_encode
        cfg = Config.fromfile(
            'configs/recognition/moco/mscl_r18_cosm_lr2e-2.py')
        pipeline = Compose([PIPELINES.build(p)
                            for p in cfg['train_pipeline']])
        paths = self._write_frames(tmp_path, n=32, hw=(256, 340))
        rng = np.random.default_rng(0)
        fpaths = []
        for i in range(12):
            p = str(tmp_path / f'flow_{i:05d}.np4')
            with open(p, 'wb') as f:
                f.write(np4_encode(rng.normal(size=(128, 170, 2))
                                   .astype(np.float32)))
            fpaths.append(p)
        results = dict(img_paths=paths, flow_paths=fpaths,
                       chosen_idx=list(range(6)), label=0,
                       total_frames=32, start_index=0,
                       filename_tmpl='img_{:05}.jpg', modality='RGB')
        out = pipeline(results)
        assert out['imgs'][0].shape == (3, 8, 112, 112)
        assert out['flow_imgs'][0].shape == (2, 16, 112, 112)
