"""Pallas kernel tests (interpret mode on CPU): fused decayed InfoNCE
forward + custom VJP vs the XLA reference formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.ops import decayed_infonce_neg, decayed_infonce_neg_xla


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    b, c, k = 8, 128, 4096
    q = rng.normal(size=(b, c)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    queue = rng.normal(size=(c, k)).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=0, keepdims=True)
    count = rng.integers(0, 2000, size=(k,)).astype(np.int32)
    return jnp.asarray(q), jnp.asarray(queue), jnp.asarray(count)


def test_forward_matches_xla(data):
    q, queue, count = data
    out = decayed_infonce_neg(q, queue, count, 0.99999, 1024, True)
    ref, _ = decayed_infonce_neg_xla(q, queue, count)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_xla(data):
    q, queue, count = data

    def loss_pallas(q):
        return decayed_infonce_neg(q, queue, count, 0.99999, 1024,
                                   True).sum()

    def loss_xla(q):
        return decayed_infonce_neg_xla(q, queue, count)[0].sum()

    g_pallas = jax.grad(loss_pallas)(q)
    g_xla = jax.grad(loss_xla)(q)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_decay_actually_applied(data):
    q, queue, count = data
    out_decay = decayed_infonce_neg(q, queue, count, 0.9, 1024, True)
    out_nodecay = decayed_infonce_neg(q, queue,
                                      jnp.zeros_like(count), 0.9,
                                      1024, True)
    assert not np.allclose(np.asarray(out_decay),
                           np.asarray(out_nodecay))
    # column j scaled by 0.9**count[j]
    scale = 0.9 ** np.asarray(count, np.float32)
    np.testing.assert_allclose(np.asarray(out_decay),
                               np.asarray(out_nodecay) * scale[None, :],
                               rtol=1e-4, atol=1e-5)


class TestCorrLookup:
    """Memory-efficient RAFT correlation lookup (ops/corr_lookup.py) vs
    the materialized XLA CorrBlock oracle (flow/raft.py)."""

    def _inputs(self, n=2, h=12, w=16, c=32, flow_scale=6.0, seed=0):
        rng = np.random.default_rng(seed)
        f1 = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
        f2 = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        base = np.stack([xs, ys], -1)[None].repeat(n, 0)
        coords = jnp.asarray(
            base + rng.normal(scale=flow_scale, size=base.shape),
            jnp.float32)
        return f1, f2, coords

    def test_scan_matches_volume(self):
        from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
        from mscl_tpu.ops.corr_lookup import corr_lookup_scan
        f1, f2, coords = self._inputs()
        ref = lookup_corr(build_corr_pyramid(f1, f2, 3), coords,
                          radius=2)
        out = corr_lookup_scan(f1, f2, coords, num_levels=3, radius=2,
                               tile=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_pallas_interpret_matches_volume(self):
        from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
        from mscl_tpu.ops.corr_lookup import corr_lookup_pallas
        f1, f2, coords = self._inputs()
        ref = lookup_corr(build_corr_pyramid(f1, f2, 3), coords,
                          radius=2)
        out = corr_lookup_pallas(f1, f2, coords, num_levels=3, radius=2,
                                 tile=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


    def test_pallas_v2_interpret_matches_volume(self):
        from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
        from mscl_tpu.ops.corr_lookup import corr_lookup_pallas_v2
        f1, f2, coords = self._inputs()
        ref = lookup_corr(build_corr_pyramid(f1, f2, 3), coords,
                          radius=2)
        out = corr_lookup_pallas_v2(f1, f2, coords, num_levels=3,
                                    radius=2, tile=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_pallas_v2_out_of_bounds_and_padding(self):
        from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
        from mscl_tpu.ops.corr_lookup import corr_lookup_pallas_v2
        f1, f2, coords = self._inputs(h=10, w=14, flow_scale=12.0)
        ref = lookup_corr(build_corr_pyramid(f1, f2, 2), coords,
                          radius=3)
        out = corr_lookup_pallas_v2(f1, f2, coords, num_levels=2,
                                    radius=3, tile=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_far_out_of_bounds_is_zero(self):
        from mscl_tpu.ops.corr_lookup import corr_lookup_scan
        f1, f2, coords = self._inputs()
        far = jnp.full_like(coords, -1000.0)
        out = corr_lookup_scan(f1, f2, far, num_levels=2, radius=2,
                               tile=16)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_non_multiple_tile_padding(self):
        from mscl_tpu.flow.raft import build_corr_pyramid, lookup_corr
        from mscl_tpu.ops.corr_lookup import corr_lookup_scan
        f1, f2, coords = self._inputs(h=10, w=14)
        ref = lookup_corr(build_corr_pyramid(f1, f2, 2), coords,
                          radius=3)
        out = corr_lookup_scan(f1, f2, coords, num_levels=2, radius=3,
                               tile=32)   # 140 % 32 != 0
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_raft_corr_impl_option(self):
        import jax as _jax
        from mscl_tpu.flow.raft import RAFT
        m_vol = RAFT(iters=2, corr_levels=2, corr_radius=2,
                     corr_impl='volume')
        m_scan = RAFT(iters=2, corr_levels=2, corr_radius=2,
                      corr_impl='scan')
        img = jnp.zeros((1, 64, 64, 3))
        v = m_vol.init(_jax.random.PRNGKey(0), img, img)
        lo1, up1 = m_vol.apply(v, img, img)
        lo2, up2 = m_scan.apply(v, img, img)
        np.testing.assert_allclose(np.asarray(up1), np.asarray(up2),
                                   atol=1e-4)


class TestFastBatchNorm:
    """ops/fast_bn.py — lane-folded BN numerics vs flax nn.BatchNorm
    (kept as a documented perf experiment; not wired into ConvBN)."""

    def test_matches_flax_bn(self):
        import jax
        from flax import linen as nn
        from mscl_tpu.ops.fast_bn import FastBatchNorm
        rng = np.random.default_rng(0)
        for shape in [(4, 3, 8, 8, 64), (4, 7, 7, 64), (2, 5, 128)]:
            x = jnp.asarray(rng.normal(size=shape) * 2 + 1, jnp.float32)
            scale = jnp.asarray(rng.normal(size=shape[-1]) * 0.5 + 1,
                                jnp.float32)
            bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
            ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                               epsilon=1e-5)
            fbn = FastBatchNorm(use_running_average=False, momentum=0.9,
                                epsilon=1e-5)
            stats = ref.init(jax.random.PRNGKey(0), x)['batch_stats']
            params = {'scale': scale, 'bias': bias}
            yr, ur = ref.apply({'params': params, 'batch_stats': stats},
                               x, mutable=['batch_stats'])
            yf, uf = fbn.apply({'params': params, 'batch_stats': stats},
                               x, mutable=['batch_stats'])
            np.testing.assert_allclose(np.asarray(yr), np.asarray(yf),
                                       atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(ur['batch_stats']['var']),
                np.asarray(uf['batch_stats']['var']), atol=1e-4)


class TestConv3dRewrites:
    """Exactness of the optional conv3d graph rewrites (both measured
    net-neutral/negative in the full MSCL step on v5e — see
    docs/benchmark.md — but kept as options; they must stay exact)."""

    def _ref(self, x, w, stride, pad):
        from mscl_tpu.ops import conv3d as c3
        c3.set_conv3d_s2d(False)
        prev_mode = c3._BWD_BARRIER
        c3.set_conv3d_bwd_barrier(False)   # oracle: plain autodiff
        prev = c3.get_conv3d_impl()
        c3.set_conv3d_impl('xla3d')   # oracle: the direct lowering
        try:
            out = c3.conv3d(x, w, stride, pad)
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, stride, pad))), argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_impl(prev)
            c3.set_conv3d_bwd_barrier(prev_mode)
        return out, g

    @pytest.mark.parametrize('cin,stride', [(3, (1, 2, 2)),
                                            (6, (2, 2, 2))])
    def test_s2d_stem_exact(self, cin, stride):
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 16, cin))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 7, 7, cin, 8)) * 0.1
        ref, gref = self._ref(x, w, stride, (1, 3, 3))
        c3.set_conv3d_s2d(True)
        try:
            out = c3.conv3d(x, w, stride, (1, 3, 3))
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, stride, (1, 3, 3)))),
                argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_s2d(False)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize('kernel,stride,pad,cin', [
        ((1, 3, 3), (1, 2, 2), (0, 1, 1), 16),   # flow-layer class
        ((1, 7, 7), (2, 2, 2), (0, 3, 3), 2),    # flow stem: strided T
        ((1, 1, 1), (2, 2, 2), (0, 0, 0), 16),   # strided downsample
        ((3, 7, 7), (1, 2, 2), (1, 3, 3), 3),    # r3d stem (kt fold)
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), 8),    # strided 3d block conv
    ])
    def test_tap2d_exact(self, kernel, stride, pad, cin):
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 16, cin))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              kernel + (cin, 8)) * 0.1
        ref, gref = self._ref(x, w, stride, pad)
        c3.set_conv3d_impl('tap2d')
        try:
            out = c3.conv3d(x, w, stride, pad)
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, stride, pad))), argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_impl('auto')
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize('mode,cin,cout', [
        ('1', 6, 5),        # round-2 full barrier
        ('gi', 6, 5),       # grad-input-only barrier
        ('gi64', 64, 64),   # surgical: barrier hits the 64-ch class...
        ('gi64', 6, 5),     # ...and is a no-op off-class (still exact)
        ('giflip', 6, 5),   # forward-form flipped-kernel grad-input
        ('giflip64', 64, 64),
        ('gibarflip64', 64, 64),
        ('gitie64', 64, 64),
        ('giwmat', 64, 64),  # materialized-flipped-weight grad-input
        ('giwmat', 6, 5),    # off-class (tap2d under auto): no-op, exact
        ('gidot', 64, 64),   # DEFAULT: physically io-swapped weights
        ('gidot', 6, 5),     # off-class: no-op, exact
        ('gidots', 64, 64),  # strided-capable variant, stride-1 case
    ])
    def test_bwd_barrier_exact(self, mode, cin, cout):
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, cin))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 3, 3, cin, cout)) * .1
        ref, gref = self._ref(x, w, (1, 1, 1), (1, 1, 1))
        prev = c3._BWD_BARRIER
        c3.set_conv3d_bwd_barrier(mode)
        try:
            out = c3.conv3d(x, w, (1, 1, 1), (1, 1, 1))
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, (1, 1, 1), (1, 1, 1)))),
                argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_bwd_barrier(prev)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize('cin,cout,w_sz', [
        (64, 64, 8),    # the layer1 class outpack targets
        (32, 64, 8),    # rectangular io, still F<=64
        (64, 64, 7),    # odd W: ineligible, must fall through exact
        (64, 128, 8),   # F>64: ineligible, must fall through exact
    ])
    def test_outpack_exact(self, cin, cout, w_sz):
        """MSCL_CONV3D_OUTPACK packs two output-W pixels into channels
        on the forward only; values and both grads must match plain
        autodiff (backward goes through the unpacked gidot path)."""
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, w_sz, cin))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 3, 3, cin, cout)) * .1
        ref, gref = self._ref(x, w, (1, 1, 1), (1, 1, 1))
        prev = c3._BWD_BARRIER
        c3.set_conv3d_bwd_barrier('gidot')
        c3.set_conv3d_outpack(True)
        try:
            out = c3.conv3d(x, w, (1, 1, 1), (1, 1, 1))
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, (1, 1, 1), (1, 1, 1)))),
                argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_outpack(False)
            c3.set_conv3d_bwd_barrier(prev)
        # packed forward sums taps in a different order -> 1e-5-scale
        # noise on f32 (13/110k elements at atol 2e-5 on first run)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-4)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-4)

    @pytest.mark.parametrize('mode', ['giwmat', 'gidot'])
    def test_wmat_strided_fallback_exact(self, mode):
        """giwmat/gidot only rewrite stride-1 SAME convs; strided convs
        must fall back to plain autodiff and stay exact."""
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 64))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 3, 3, 64, 64)) * .1
        ref, gref = self._ref(x, w, (2, 2, 2), (1, 1, 1))
        prev = c3._BWD_BARRIER
        c3.set_conv3d_bwd_barrier(mode)
        try:
            out = c3.conv3d(x, w, (2, 2, 2), (1, 1, 1))
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, (2, 2, 2), (1, 1, 1)))),
                argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_bwd_barrier(prev)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize('kshape,stride,pad,xshape', [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (2, 4, 8, 8)),   # block conv
        ((1, 1, 1), (2, 2, 2), (0, 0, 0), (2, 6, 8, 8)),   # downsample
        ((3, 3, 3), (1, 2, 2), (1, 1, 1), (2, 5, 8, 8)),   # mixed stride
        ((3, 3, 3), (1, 1, 1), (1, 1, 1), (2, 4, 8, 8)),   # stride-1 path
        ((3, 3, 3), (1, 1, 1), (0, 0, 0), (2, 6, 8, 8)),   # stride-1 VALID
        ((5, 3, 3), (1, 1, 1), (1, 1, 1), (2, 6, 8, 8)),   # stride-1 p<k//2
        ((3, 7, 7), (1, 2, 2), (1, 3, 3), (2, 4, 8, 8)),   # stem-like
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (2, 5, 9, 9)),   # odd I: fallback
        ((3, 3, 3), (2, 2, 2), (0, 0, 0), (2, 6, 8, 8)),   # VALID pad
        ((5, 3, 3), (3, 2, 2), (2, 1, 1), (2, 6, 8, 8)),   # stride 3
    ])
    def test_giphase_strided_exact(self, kshape, stride, pad, xshape):
        """'giphase' decomposes STRIDED grad-input convs into s^3 plain
        stride-1 phase convs + an interleave (tests/test_ops.py is the
        exactness lock the benchmark dossier cites)."""
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), xshape + (8,))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              kshape + (8, 16)) * .1
        ref, gref = self._ref(x, w, stride, pad)
        prev_impl = c3.get_conv3d_impl()
        prev = c3._BWD_BARRIER
        c3.set_conv3d_impl('xla3d')
        c3.set_conv3d_bwd_barrier('giphase')
        try:
            out = c3.conv3d(x, w, stride, pad)
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, stride, pad))), argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_impl(prev_impl)
            c3.set_conv3d_bwd_barrier(prev)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize('kshape,stride,pad,xshape', [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (2, 5, 9, 9)),  # block conv
        ((1, 1, 1), (2, 2, 2), (0, 0, 0), (2, 6, 8, 8)),  # downsample
        ((3, 3, 3), (1, 2, 2), (1, 1, 1), (2, 5, 9, 9)),  # mixed stride
    ])
    def test_gidots_strided_exact(self, kshape, stride, pad, xshape):
        """'gidots' rewrites STRIDED grad-input convs as lhs-dilated
        forward convs over physically io-swapped flipped weights."""
        from mscl_tpu.ops import conv3d as c3
        x = jax.random.normal(jax.random.PRNGKey(0), xshape + (8,))
        w = jax.random.normal(jax.random.PRNGKey(1),
                              kshape + (8, 16)) * .1
        ref, gref = self._ref(x, w, stride, pad)
        prev_impl = c3.get_conv3d_impl()
        prev = c3._BWD_BARRIER
        c3.set_conv3d_impl('xla3d')
        c3.set_conv3d_bwd_barrier('gidots')
        try:
            out = c3.conv3d(x, w, stride, pad)
            g = jax.grad(lambda a, b: jnp.sum(jnp.tanh(
                c3.conv3d(a, b, stride, pad))), argnums=(0, 1))(x, w)
        finally:
            c3.set_conv3d_impl(prev_impl)
            c3.set_conv3d_bwd_barrier(prev)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        for a, b in zip(g, gref):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


class TestNeckConvDispatch:
    """neck_conv eligibility gate (ADVICE r4): anything outside
    TpuConv's supported surface must route to flax nn.Conv instead of
    crashing inside TpuConv's padding normalization."""

    CASES = [
        # (kwargs, expect_tpuconv)
        (dict(padding='SAME'), True),
        (dict(padding=1), True),
        (dict(padding=((0, 0), (1, 1), (1, 1))), True),
        (dict(padding=((0, 1), (0, 0), (0, 0))), False),  # asymmetric
        (dict(padding='VALID'), False),
        (dict(padding='SAME', strides=(1, 2, 2)), False),
        (dict(padding=1, feature_group_count=2), False),
        (dict(padding=1, kernel_dilation=(1, 2, 2)), False),
    ]

    @pytest.mark.parametrize('kwargs,expect_tpu', CASES)
    def test_dispatch_and_exec(self, kwargs, expect_tpu):
        from flax import linen as nn
        from mscl_tpu.models.common.tpu_conv import TpuConv, neck_conv
        kw = dict(kwargs)
        strides = kw.pop('strides', (1, 1, 1))
        mod = neck_conv(16, (3, 3, 3), strides=strides, **kw)
        assert isinstance(mod, TpuConv) == expect_tpu, mod
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 8))
        variables = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(variables, x)
        assert out.shape[0] == 1 and out.shape[-1] == 16
        # Identical param tree either way (checkpoint compatibility).
        assert set(variables['params']) == {'kernel', 'bias'}
        groups = kwargs.get('feature_group_count', 1)
        assert variables['params']['kernel'].shape == \
            (3, 3, 3, 8 // groups, 16)
