"""3D convolution lowered to a single 2D convolution (TPU fast path).

XLA-TPU's 3D convolution path reaches only ~20% MFU on the r3d_18 tower
(docs/benchmark.md round-1 breakdown), while its 2D conv path is the
heavily tuned one. A (kt, kh, kw) conv over (N, T, H, W, C) is exactly a
(kh, kw) conv over (N*T_out, H, W, kt*C) on temporally-stacked input:

    out[n, t, y, x, f] = sum_{dt, dy, dx, c}
        in[n, st*t + dt - pt, ...] * w[dt, dy, dx, c, f]

so we gather the kt temporal taps (cheap strided slices), concatenate
them on the channel axis, and issue ONE 2D conv whose kernel is the 3D
kernel with the temporal axis folded into input channels. FLOPs are
identical; the MXU sees a single large 2D conv.

The parameter keeps the torchvision 3D layout (kt, kh, kw, C, F) so
checkpoints/init are unchanged; only the compute graph differs.

Parity role: this is the TPU-native answer to the reference's cuDNN 3D
convs (torchvision VideoResNet, reference fastonly.py conv makers).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Global implementation policy:
#   'xla3d' — direct lax 3D conv everywhere
#   'tap2d' — 2D lowering everywhere
#   'auto'  — tap2d where the direct path is measured-pathological
#             (kt == 1: the T axis is trivially batchable; thin input
#             channels: v5e microbench shows the 3-ch stem at 0.1% MFU
#             under xla3d vs 5.2% under tap2d), xla3d otherwise.
# Full-step v5e measurements (MSCL r18, bs32): at the round-2 half-res
# flow shapes all-xla3d 94.6 ms/step, all-tap2d 172.9 (tap stacking
# triples conv input HBM traffic on the all-3x3x3 RGB tower), auto 98.2.
# At the corrected recipe shapes (flow at 112, round 3) 'auto' WINS:
# 87.3 vs 93.9 ms/step — the kt==1 flow-tower convs are 4x bigger and
# the 2D lowering pays; 'auto' is now the default.
_IMPL = os.environ.get('MSCL_CONV3D_IMPL', 'auto')


def set_conv3d_impl(impl: str) -> None:
    global _IMPL
    assert impl in ('tap2d', 'xla3d', 'auto', 'sumtap'), impl
    _IMPL = impl


def get_conv3d_impl() -> str:
    return _IMPL


# Cotangent materialization barrier. The round-2 step profile shows the
# four layer1 grad-input convs at 48 TF/s vs 92 TF/s forward — XLA fuses
# the BN/relu-backward elementwise graph into the grad-conv fusion,
# where it is re-evaluated per conv window tap. Modes:
#   '0'    — off (default)
#   '1'    — barrier g before BOTH grads, every conv (round-2 experiment:
#            measured NET-NEGATIVE, 83.1 vs 77.6 ms/step — materializing
#            every cotangent costs more than the recompute saves)
#   'gi'   — barrier only the grad-INPUT path's cotangent, every conv
#   'gi64' — barrier only grad-input and only for the measured-
#            pathological class (3x3x3, C=F=64, stride 1): the surgical
#            split — 4 cotangent materializations (~1 ms HBM) vs ~7 ms
#            of conv-fusion slowdown.
#
# DEFAULT is 'gidot' (round-3 continuation; the NINTH experiment and
# the one that cracked the wall): see _wmat_bwd. Full-program A/B on
# v5e at recipe shapes: 76.0 -> 70.4 ms/step sustained 500 steps
# (421.1 -> 454.4 clips/s/chip). Set =0 to revert to plain autodiff.
_BWD_BARRIER = os.environ.get('MSCL_CONV3D_BWD_BARRIER', 'gidot')


#   'giflip'  — no barrier; rewrite the grad-input conv of stride-1 SAME
#            3x3x3 convs as a FORWARD-form conv on the cotangent with the
#            spatially-flipped, io-swapped kernel (mathematically
#            identical). Hypothesis: XLA's transposed-conv emitter is the
#            slow part (measured 48 TF/s vs 92 forward), not the fused
#            epilogue — the gi64 barrier A/B (79.9 vs 76.4 ms/step)
#            ruled the epilogue theory out.
#   'giflip64' — same, restricted to the C=F=64 class.
#   'giwmat' — (round-3 continuation; the EIGHTH grad-input experiment)
#            materialize the FLIPPED WEIGHTS, not the cotangent:
#            dx = conv(g, barrier(flip(w)^T)). Every prior experiment
#            barriered/rewrote the conv's big INPUT operand (103 MB —
#            materialization always lost); none touched the 442 KB
#            weight operand. FULL-PROGRAM A/B: 76.0 -> 75.7 ms/step —
#            within noise. Compiled-HLO forensics explained why: the
#            barrier pins MATERIALIZATION but not LAYOUT, so XLA folds
#            the io-swap transpose into the conv kernel operand's
#            layout ({3,4,2,1,0} bitcast) and keeps the slow
#            EmitOutputBatchInSublanes conv emitter, while the
#            byte-identical forward conv gets EmitAllBatchInSublanes
#            (5.5M vs 3.68M estimated cycles; 3.70 vs 1.95 ms measured).
#   'gidot' — (NINTH, the winner, now the default) same rewrite but the
#            io-swap is a dot with the identity, which XLA cannot
#            bitcast away — the flipped kernel physically lands in the
#            forward conv's standard layout and the grad-input conv
#            gets the forward emitter. Full-program A/B on v5e:
#            76.0 -> 70.4 ms/step sustained (421.1 -> 454.4
#            clips/s/chip). The seven prior "structural wall"
#            experiments all poked the fusion structure; the wall was
#            the kernel-operand layout all along.


# forward-form grad-input rewrite family (share one tuple so the three
# dispatch sites — conv3d, _conv3d_s2d_stem, the barrier fallthrough —
# can't drift; ADVICE r3 low finding).
_WMAT_MODES = ('giwmat', 'gidot', 'gidots', 'giphase')


def set_conv3d_bwd_barrier(mode) -> None:
    global _BWD_BARRIER
    if mode in (True, False):
        mode = '1' if mode else '0'
    assert mode in ('0', '1', 'gi', 'gi64', 'giflip', 'giflip64',
                    'gibarflip64', 'gitie64', 'giwmat', 'gidot',
                    'gidots', 'giphase'), mode
    _BWD_BARRIER = mode


# Space-to-depth stem rewrite (thin-input-channel convs). The stem's
# C_in=3 fills almost none of the MXU reduction dim; folding 2x2 spatial
# phases into channels (C_in -> 4*C_in, 7x7/2 kernel -> 4x4/1) is an
# exact rewrite (standard TPU ResNet trick) that quadruples K per tap.
# Full-program A/B on v5e: 78.0 vs 77.6 ms/step — the stem conv speedup
# is cancelled by the input fold transpose, so default off.
_S2D = os.environ.get('MSCL_CONV3D_S2D', '0') == '1'


def set_conv3d_s2d(on: bool) -> None:
    global _S2D
    _S2D = bool(on)


# Output-W packing (round 4). The layer1 3x3x3 F=64 convs fill only half
# the MXU's 128 output lanes. Packing two ADJACENT OUTPUT pixels into the
# channel dim — y'[.., w2, p*F+c] == y[.., 2*w2+p, c] — makes the conv a
# stride-(1,1,2) conv with a (kt,kh,kw+1,C,2F) kernel (25% structural
# zeros, +33% MACs at the full-lane rate) and leaves the INPUT untouched
# (the input-side s2d fold transpose is what killed the round-2/3
# attempts). Backward is unaffected: _wmat_bwd recomputes the PLAIN
# conv's vjp from (x, kernel), so grad-input keeps the gidot fast path
# and grad-weight its natural fused emission. Isolated micro
# (tools/analysis/bench_outpack.py, v5e): fwd chain 81.1 -> 65.7 ms
# (1.23x), fwd+bwd-through-packed 1.07x (not used — see above).
_OUTPACK = os.environ.get('MSCL_CONV3D_OUTPACK', '0') == '1'


def set_conv3d_outpack(on: bool) -> None:
    global _OUTPACK
    _OUTPACK = bool(on)


def _outpack_applicable(x_shape, kernel, stride, padding) -> bool:
    f = kernel.shape[4]
    return (_OUTPACK and f <= 64 and x_shape[3] % 2 == 0 and
            _flip_conv_applicable(kernel, stride, padding))


def _outpack_conv(x, kernel, padding):
    """Forward-only packed evaluation (exact; see tests/test_ops.py)."""
    kt, kh, kw, c, f = kernel.shape
    z = jnp.zeros((kt, kh, 1, c, f), kernel.dtype)
    wp = jnp.concatenate([jnp.concatenate([kernel, z], axis=2),
                          jnp.concatenate([z, kernel], axis=2)], axis=4)
    pads = tuple((p, p) if not isinstance(p, tuple) else p
                 for p in padding)
    y = lax.conv_general_dilated(
        x, wp, (1, 1, 2), pads,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    n, t, h, w2, _ = y.shape
    return y.reshape(n, t, h, w2 * 2, f)


def temporal_subsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x[:, ::stride] without a gather: jnp's strided basic indexing
    lowers to stablehlo.gather (and its transpose to a scatter); the
    exact-divisor form is a reshape + unit slice, the remainder form a
    lax strided slice. Used for the SlowFast pathway split and the flow
    stems' frame subsample."""
    if stride <= 1:
        return x
    t = x.shape[1]
    t_out = -(-t // stride)
    if t % stride == 0:
        shp = x.shape
        return x.reshape((shp[0], t // stride, stride) + shp[2:])[:, :, 0]
    return lax.slice_in_dim(x, 0, (t_out - 1) * stride + 1, stride, axis=1)


def conv3d(x: jnp.ndarray, kernel: jnp.ndarray,
           stride: Tuple[int, int, int],
           padding: Tuple[int, int, int]) -> jnp.ndarray:
    """NTHWC 3D conv with kernel (kt, kh, kw, C, F), symmetric padding."""
    if (_S2D and kernel.shape[1] == 7 and kernel.shape[2] == 7 and
            kernel.shape[3] <= 8 and tuple(stride)[1:] == (2, 2) and
            tuple(padding)[1:] == (3, 3) and x.shape[2] % 2 == 0 and
            x.shape[3] % 2 == 0):
        return _conv3d_s2d_stem(x, kernel, tuple(stride), tuple(padding))
    if (_BWD_BARRIER in _WMAT_MODES and
            _resolve_impl(kernel, stride) == 'xla3d' and
            _wmat_applicable(kernel, stride, padding)):
        return _conv3d_xla_wmat(x, kernel, tuple(stride), tuple(padding))
    if _BWD_BARRIER not in ('0',) + _WMAT_MODES and _IMPL == 'xla3d':
        return _conv3d_xla_barrier(x, kernel, tuple(stride),
                                   tuple(padding))
    return _conv3d_dispatch(x, kernel, stride, padding)


def _conv3d_s2d_stem(x, kernel, stride, padding):
    """Exact 2x2 space-to-depth rewrite of a (kt,7,7,C,F)/(st,2,2)/pad 3
    stem conv: y[i] reads u = 2i + dy - 3; with dy = 2m + b - 1 this is
    u = 2(i + m - 2) + b, i.e. a 4-tap stride-1 conv over the folded
    input xf[p, b] = x[2p + b] with folded padding (2, 1)."""
    n, t, h, w, c = x.shape
    kt, _, _, _, f = kernel.shape
    st, pt = stride[0], padding[0]
    # fold input: (n,t,h/2,2,w/2,2,c) -> (n,t,h/2,w/2,2,2,c) -> 4c
    xf = x.reshape(n, t, h // 2, 2, w // 2, 2, c)
    xf = xf.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        n, t, h // 2, w // 2, 4 * c)
    # fold kernel: pad dy/dx 7->8 (one leading zero tap so dy+1 = 2m+b)
    kp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    kf = kp.reshape(kt, 4, 2, 4, 2, c, f)
    kf = kf.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * c, f)
    if _BWD_BARRIER not in ('0',) + _WMAT_MODES:
        return _conv3d_xla_barrier(xf, kf, (st, 1, 1),
                                   ((pt, pt), (2, 1), (2, 1)))
    return _conv3d_xla(xf, kf, (st, 1, 1), ((pt, pt), (2, 1), (2, 1)))


# default ON: full-program A/B on v5e at recipe shapes measured 82.3
# vs 84.5 ms/step (the r3d 1x1x1 stride-2 downsamples' tap2d grad chain
# was paying ~2 ms of pad/slice/copy). Set =0 for the round-3 v1 rule.
_AUTO_V2 = os.environ.get('MSCL_CONV3D_AUTO_V2', '1') == '1'


def _resolve_impl(kernel, stride):
    impl = _IMPL
    if impl == 'auto':
        if _AUTO_V2:
            # v2 rule: thin-channel convs (stems) stay tap2d (xla3d is
            # 0.1% MFU there), temporal-stride-1 kt==1 convs (the flow
            # tower) stay tap2d, but kt==1 convs that STRIDE the T axis
            # (the r3d 1x1x1 downsamples) go xla3d — their tap2d grad
            # chain pays pad/slice/copy (~1.5 ms/step, profile r3c).
            # Differs from the round-3 'temporal-stride-1' experiment,
            # which also reverted the thin-channel flow stem and lost.
            impl = 'tap2d' if (kernel.shape[3] < 16 or
                               (kernel.shape[0] == 1 and
                                tuple(stride)[0] == 1)) else 'xla3d'
        else:
            impl = 'tap2d' if (kernel.shape[0] == 1 or
                               kernel.shape[3] < 16) else 'xla3d'
    return impl


def _conv3d_dispatch(x, kernel, stride, padding):
    impl = _resolve_impl(kernel, stride)
    if impl == 'xla3d':
        return _conv3d_xla(x, kernel, stride, padding)
    if impl == 'sumtap':
        return _conv3d_sumtap(x, kernel, stride, padding)
    return _conv3d_tap2d(x, kernel, stride, padding)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3d_xla_barrier(x, kernel, stride, padding):
    return _conv3d_xla(x, kernel, stride, padding)


def _conv3d_barrier_fwd(x, kernel, stride, padding):
    return _conv3d_xla(x, kernel, stride, padding), (x, kernel)


def _is_gi64_class(kernel) -> bool:
    kt, kh, kw, c, f = kernel.shape
    return (kt, kh, kw) == (3, 3, 3) and c == 64 and f == 64


def _flip_conv_applicable(kernel, stride, padding):
    """giflip precondition: stride-1 SAME square conv so
    dx == conv(g, flip(W) with io swapped) exactly."""
    kt, kh, kw = kernel.shape[:3]
    pads = tuple(p if isinstance(p, tuple) else (p, p) for p in padding)
    return (tuple(stride) == (1, 1, 1) and
            pads == ((kt // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2) and
            kt % 2 == 1 and kh % 2 == 1 and kw % 2 == 1)


def _wmat_applicable(kernel, stride, padding):
    """gidot/gidots dispatch gate. 'gidots' extends the forward-form
    grad-input rewrite to STRIDED convs via lhs_dilation (symmetric
    int padding only); 'gidot'/'giwmat' stay stride-1 SAME."""
    if _BWD_BARRIER in ('gidots', 'giphase'):
        return all(isinstance(p, int) or p[0] == p[1] for p in padding)
    return _flip_conv_applicable(kernel, stride, padding)


def _conv3d_barrier_bwd(stride, padding, res, g):
    x, kernel = res
    mode = _BWD_BARRIER
    _, vjp = jax.vjp(
        lambda x_, k_: _conv3d_xla(x_, k_, stride, padding), x, kernel)
    if mode == '1':
        return vjp(lax.optimization_barrier(g))
    if mode == 'gi' or (mode == 'gi64' and _is_gi64_class(kernel)):
        # materialize the cotangent for the grad-input conv only; the
        # grad-weight conv (94 TF/s with the fused epilogue) keeps g raw
        dx, _ = vjp(lax.optimization_barrier(g))
        _, dw = vjp(g)
        return dx, dw
    if (mode in ('giflip', 'giflip64') and
            _flip_conv_applicable(kernel, stride, padding) and
            (mode == 'giflip' or _is_gi64_class(kernel))):
        _, dw = vjp(g)          # XLA DCEs the unused dx from this call
        wf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        dx = _conv3d_xla(g, wf, (1, 1, 1),
                         tuple(k // 2 for k in kernel.shape[:3]))
        return dx, dw
    if mode == 'gitie64' and _is_gi64_class(kernel) and \
            _flip_conv_applicable(kernel, stride, padding):
        # materialize g as a BY-PRODUCT of the grad-weight fusion: the
        # tuple barrier ties (g, dw), so XLA can emit the dw fusion as a
        # multi-output fusion that also writes g — the dx conv then
        # reads a clean materialized cotangent without a dedicated
        # materialization pass (vs gi64, which paid one).
        _, dw = vjp(g)
        g2, dw2 = lax.optimization_barrier((g, dw))
        wf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        dx = _conv3d_xla(g2, wf, (1, 1, 1),
                         tuple(k // 2 for k in kernel.shape[:3]))
        return dx, dw2
    if mode == 'gibarflip64' and _is_gi64_class(kernel) and \
            _flip_conv_applicable(kernel, stride, padding):
        # barrier AND forward-form rewrite: materialize the cotangent,
        # then run dx as a clean forward conv over it (neither move
        # helped alone — this tests whether together they reach the
        # 92 TF/s forward rate)
        gb = lax.optimization_barrier(g)
        wf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        dx = _conv3d_xla(gb, wf, (1, 1, 1),
                         tuple(k // 2 for k in kernel.shape[:3]))
        _, dw = vjp(g)
        return dx, dw
    return vjp(g)


_conv3d_xla_barrier.defvjp(_conv3d_barrier_fwd, _conv3d_barrier_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3d_xla_wmat(x, kernel, stride, padding):
    if _outpack_applicable(x.shape, kernel, stride, padding):
        return _outpack_conv(x, kernel, padding)
    return _conv3d_xla(x, kernel, stride, padding)


def _wmat_fwd(x, kernel, stride, padding):
    if _outpack_applicable(x.shape, kernel, stride, padding):
        return _outpack_conv(x, kernel, padding), (x, kernel)
    return _conv3d_xla(x, kernel, stride, padding), (x, kernel)


def _wmat_bwd(stride, padding, res, g):
    """'giwmat': grad-input conv over MATERIALIZED flipped weights.

    dx of a stride-1 SAME conv is exactly conv(g, flip(w) io-swapped).
    Autodiff leaves the flip/transpose in-graph, XLA fuses it into the
    conv fusion's weight operand, and the conv drops to its slow path
    (measured 31 vs 44.8 TF/s isolated, 48 vs 92 in-program). The
    optimization_barrier materializes the flipped kernel (442 KB for the
    layer1 class) so the conv sees a plain parameter. grad-weight keeps
    XLA's natural fused emission (94 TF/s; the unused dx from that vjp
    call is dead-code-eliminated).
    """
    x, kernel = res
    _, vjp = jax.vjp(
        lambda x_, k_: _conv3d_xla(x_, k_, stride, padding), x, kernel)
    _, dw = vjp(g)
    if (_BWD_BARRIER == 'giphase' and tuple(stride) != (1, 1, 1) and
            all(x.shape[1 + d] % stride[d] == 0 for d in range(3))):
        return _phase_grad_input(g, kernel, stride, padding, x.shape), dw
    wf = jnp.flip(kernel, axis=(0, 1, 2))
    if _BWD_BARRIER in ('gidot', 'gidots', 'giphase'):
        # Post-giwmat finding (compiled-HLO forensics): the barrier pins
        # MATERIALIZATION but not LAYOUT — XLA folds the io-swap
        # transpose into the conv kernel operand's layout ({3,4,2,1,0}
        # bitcast), and the gi conv keeps the slow
        # EmitOutputBatchInSublanes emitter (5.50M est. cycles) while
        # the byte-identical forward conv gets EmitAllBatchInSublanes
        # (3.68M). 'gidot' forces a PHYSICAL io-swap: a dot with the
        # identity cannot be bitcast away, so the kernel arrives in the
        # forward conv's exact standard layout (~7M MACs, negligible).
        eye = jnp.eye(wf.shape[3], dtype=wf.dtype)
        wfT = jnp.einsum('thwio,iI->thwoI', wf, eye)
    else:
        wfT = lax.optimization_barrier(wf.transpose(0, 1, 2, 4, 3))
    if tuple(stride) == (1, 1, 1):
        # general stride-1 grad-input pads: lo = K-1-p, hi = I+p-O
        # (== (k//2, k//2) for SAME; ADVICE r3: the old hardcoded k//2
        # was wrong for stride-1 pad != k//2, reachable under gidots/
        # giphase whose gate accepts any symmetric padding).
        pads = []
        for d in range(3):
            k = kernel.shape[d]
            p = padding[d] if not isinstance(padding[d], tuple) \
                else padding[d][0]
            pads.append((k - 1 - p, x.shape[1 + d] + p - g.shape[1 + d]))
        dx = _conv3d_xla(g, wfT, (1, 1, 1), tuple(pads))
    else:
        # strided ('gidots'): dx = forward conv over the stride-dilated
        # cotangent — pad_lo = K-1-p, pad_hi = I + p - (O-1)s - 1 makes
        # the output exactly input-sized (the standard transposed-conv
        # geometry; exactness locked against plain autodiff in
        # tests/test_ops.py).
        pads = []
        for d in range(3):
            k = kernel.shape[d]
            p = padding[d] if not isinstance(padding[d], tuple) \
                else padding[d][0]
            i_sz, o_sz, s = x.shape[1 + d], g.shape[1 + d], stride[d]
            pads.append((k - 1 - p, i_sz + p - (o_sz - 1) * s - 1))
        dx = lax.conv_general_dilated(
            g, wfT, window_strides=(1, 1, 1), padding=pads,
            lhs_dilation=tuple(stride),
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return dx, dw


_conv3d_xla_wmat.defvjp(_wmat_fwd, _wmat_bwd)


def _phase_grad_input(g, kernel, stride, padding, x_shape):
    """'giphase': strided grad-input as s_t*s_h*s_w PLAIN stride-1 convs.

    'gidots' proved (compile-check) that lhs_dilation rules out the
    fast EmitAllBatchInSublanes conv emitter, the same way the folded
    kernel layout did for the stride-1 class before 'gidot'. This mode
    removes the dilation entirely: the transposed conv is decomposed by
    input phase (the sub-pixel-conv identity). Per dim with stride s,
    pad p, kernel K: positions i with (i + p) % s == r are produced by
    taps k in {r, r+s, ...}, so

        dx[j*s + r - p] = sum_m g[j - m] * w[r + s*m]

    i.e. a stride-1 conv of g with the FLIPPED sub-kernel w[r::s]
    (io-swapped via the 'gidot' identity-dot so it lands in the forward
    layout), with padding lo = M-1-c, hi = I/s + c - O where
    c = (q + p - r) / s and q = (r - p) % s is the phase's position
    inside each stride group. The s^3 phase outputs interleave back via
    one stack + transpose + reshape (a dx-sized relayout, ~25 MB for
    the layer2 class). Kernel taps sum to K^3 across phases — FLOPs are
    identical to the dilated form. Empty phases (M == 0 in some dim,
    e.g. the odd phases of a 1x1x1/s2 downsample) are zeros, so the
    downsample dx costs ONE channel matmul + the interleave.
    Exactness is locked against plain autodiff in tests/test_ops.py.
    """
    pads = tuple(p if isinstance(p, int) else p[0] for p in padding)
    ins = x_shape[1:4]
    outs = g.shape[1:4]
    js = tuple(ins[d] // stride[d] for d in range(3))
    eye = jnp.eye(kernel.shape[3], dtype=kernel.dtype)
    phases = {}
    for r0 in range(stride[0]):
        for r1 in range(stride[1]):
            for r2 in range(stride[2]):
                r = (r0, r1, r2)
                q = tuple((r[d] - pads[d]) % stride[d] for d in range(3))
                ms = tuple(len(range(r[d], kernel.shape[d], stride[d]))
                           for d in range(3))
                if min(ms) == 0:
                    phases[q] = None
                    continue
                gp, conv_pads = g, []
                for d in range(3):
                    c = (q[d] + pads[d] - r[d]) // stride[d]
                    lo = ms[d] - 1 - c
                    hi = js[d] + c - outs[d]
                    if lo < 0:
                        gp = lax.slice_in_dim(gp, -lo, gp.shape[1 + d],
                                              axis=1 + d)
                        lo = 0
                    if hi < 0:
                        gp = lax.slice_in_dim(gp, 0, gp.shape[1 + d] + hi,
                                              axis=1 + d)
                        hi = 0
                    conv_pads.append((lo, hi))
                wf = jnp.flip(
                    kernel[r0::stride[0], r1::stride[1], r2::stride[2]],
                    axis=(0, 1, 2))
                wfT = jnp.einsum('thwio,iI->thwoI', wf, eye)
                phases[q] = _conv3d_xla(gp, wfT, (1, 1, 1),
                                        tuple(conv_pads))
    proto = next(v for v in phases.values() if v is not None)
    flat = [phases[q] if phases[q] is not None
            else jnp.zeros(proto.shape, proto.dtype)
            for q in sorted(phases)]
    if len(flat) == 1:
        return flat[0]
    n, c = g.shape[0], kernel.shape[3]
    out = jnp.stack(flat, axis=0).reshape(stride + proto.shape)
    out = out.transpose(3, 4, 0, 5, 1, 6, 2, 7)
    return out.reshape((n,) + tuple(ins) + (c,))


def _conv3d_sumtap(x, kernel, stride, padding):
    """Sum of kt per-tap 2D convs — same FLOPs, no kt*C concat
    materialization (vs tap2d); each tap reads a strided slice of x."""
    kt, kh, kw, c, f = kernel.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    n, t, h, w, _ = x.shape
    if pt:
        x = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    t_out = (t + 2 * pt - kt) // st + 1
    out = None
    for dt in range(kt):
        xs = lax.slice_in_dim(x, dt, dt + st * (t_out - 1) + 1, st,
                              axis=1)
        xs = xs.reshape(n * t_out, h, w, c)
        o = lax.conv_general_dilated(
            xs, kernel[dt], (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = o if out is None else out + o
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(n, t_out, ho, wo, f)


def _conv3d_xla(x, kernel, stride, padding):
    return lax.conv_general_dilated(
        x, kernel, window_strides=stride,
        padding=[p if isinstance(p, tuple) else (p, p)
                 for p in padding],
        dimension_numbers=('NTHWC'.replace('T', 'D'),
                           'DHWIO', 'NDHWC'))


def _conv3d_tap2d(x, kernel, stride, padding):
    kt, kh, kw, c, f = kernel.shape
    st, sh, sw = stride
    pt, ph, pw = padding
    n, t, h, w, _ = x.shape

    if pt:
        x = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
    t_pad = t + 2 * pt
    t_out = (t_pad - kt) // st + 1

    if kt == 1:
        if st > 1 and t_pad % st == 0:
            # grad-friendly temporal subsample: reshape + plain slice.
            # A strided slice's transpose is a scatter (XLA lowers it to
            # while-loops + layout copies, ~2 ms/step measured); a plain
            # slice's transpose is a cheap zero-pad.
            x2 = x.reshape(n, t_pad // st, st, h, w, c)[:, :t_out, 0]
        elif st > 1:
            x2 = x[:, ::st][:, :t_out]
        else:
            x2 = x[:, :t_out]
        x2 = x2.reshape(n * t_out, h, w, c)
        k2 = kernel.reshape(kh, kw, c, f)
    else:
        # kt strided temporal taps, folded into channels
        taps = [
            lax.slice_in_dim(x, dt, dt + st * (t_out - 1) + 1, st, axis=1)
            for dt in range(kt)
        ]
        x2 = jnp.concatenate(taps, axis=-1)          # (n,t_out,h,w,kt*c)
        x2 = x2.reshape(n * t_out, h, w, kt * c)
        # channel order after concat is [tap0:C, tap1:C, ...] -> kernel
        # in-channel index dt*C + c
        k2 = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            kh, kw, kt * c, f)

    out = lax.conv_general_dilated(
        x2, k2, window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(n, t_out, ho, wo, f)
