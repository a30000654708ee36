"""Memory-efficient RAFT correlation lookup — Pallas TPU kernel.

TPU-native equivalent of the reference's only CUDA component
(tools/RAFT/alt_cuda_corr/correlation_kernel.cu:18-121 forward): compute
the (2r+1)^2 bilinear correlation window per query pixel over the
4-level pyramid WITHOUT materializing the full (H*W)^2 all-pairs volume
(flow/raft.py build_corr_pyramid materializes it; at RAFT's 440x1024
resolution that volume is ~250 MB per image vs. one 64-row slab here).

Design (per grid step = one tile of TILE query pixels of one batch):
  1. slab = f1_tile (TILE, C) @ f2^T (C, H*W) / sqrt(C)   [MXU]
  2. 2x2-avg-pool the slab into the 4 pyramid levels       [VPU]
  3. zero-pad each level by 2r+2 and, per pixel, dynamic-slice a
     (2r+2, 2r+2) patch around floor(center/2^l) and bilinear-blend
     the 4 shifted corners — exactly grid_sample(zeros padding,
     align_corners=True) semantics of the XLA path
     (flow/raft.py bilinear_sampler/lookup_corr).

The FLOPs match the all-pairs volume (each tile re-correlates against
all of f2) but peak memory per step is one (TILE, H*W) slab; this is
the alt_cuda_corr trade (recompute over materialize).

Three implementations, measured on v5e at RAFT's 440x1024 resolution
(55x128x256, r=4, L=4; bench_corr_lookup.py):

    volume (reference default)   478 ms/lookup   temp 466.1 MB
    scan                         246 ms/lookup   temp   0.8 MB
    pallas_v2 (production)      4.77 ms/lookup   temp 230.8 MB*

corr_lookup_pallas_v2 is the production TPU path (RAFT corr_impl
'auto'): a fully vectorized kernel whose bilinear window gather is two
batched MXU matmuls against *soft one-hot* selector matrices — 52x
faster than the scan tiling and 100x faster than materializing the
pyramid. (*the temp is the (L, k, k)-slotted output layout Mosaic
needs for aligned stores; it is transient and its bandwidth cost is
~0.6 ms of the 4.77.)

corr_lookup_scan keeps identical-to-oracle numerics for CPU/tests.
The original per-pixel kernel (corr_lookup_pallas) is kept as the
journal of the Mosaic constraints that shaped v2: value dynamic_slice,
lane-dim reshapes, (tile,k,k)->(tile,k*k) collapses, sub-128 lane
concats and unaligned stores all fail to lower; per-(level,dy)
origin-aligned stores, iota-comparison selectors and batched
dot_general lower cleanly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_dims(h: int, w: int, num_levels: int):
    dims = [(h, w)]
    for _ in range(num_levels - 1):
        h, w = h // 2, w // 2
        dims.append((h, w))
    return dims


def _pool2x2(slab, h, w):
    """(T, h, w) -> (T, h//2, w//2) mean pool, cropping odd remainders
    (matches flow/raft.py build_corr_pyramid)."""
    t = slab.shape[0]
    ch, cw = h // 2, w // 2
    s = slab[:, :ch * 2, :cw * 2].reshape(t, ch, 2, cw, 2)
    return s.mean(axis=(2, 4))


def _window_from_patch(patch, fx, fy, r):
    """(2r+2, 2r+2) integer patch + fractional center -> (2r+1, 2r+1)
    bilinear window."""
    k = 2 * r + 1
    p00 = patch[:k, :k]
    p01 = patch[:k, 1:k + 1]
    p10 = patch[1:k + 1, :k]
    p11 = patch[1:k + 1, 1:k + 1]
    return ((1 - fy) * (1 - fx) * p00 + (1 - fy) * fx * p01 +
            fy * (1 - fx) * p10 + fy * fx * p11)


def _level_geometry(coords_tile, level, hl, wl, radius):
    """Per-pixel patch start (in padded space) + fractional weights."""
    r = radius
    pad = 2 * r + 2
    scale = jnp.float32(2 ** level)
    cx = coords_tile[:, 0] / scale
    cy = coords_tile[:, 1] / scale
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(jnp.float32)
    fy = (cy - y0).astype(jnp.float32)
    # clipping parks fully-outside windows inside the zero padding
    # (pad = window size)
    sx = jnp.clip(x0.astype(jnp.int32) - r + pad, 0, wl + pad)
    sy = jnp.clip(y0.astype(jnp.int32) - r + pad, 0, hl + pad)
    return sx, sy, fx, fy


def _lookup_tile(slab, coords_tile, h, w, num_levels, radius):
    """slab (T, H*W) f32, coords_tile (T, 2) level-0 (x, y) ->
    (T, num_levels*(2r+1)^2). Pure-jnp path (scan fallback / oracle)."""
    tile = slab.shape[0]
    r = radius
    k = 2 * r + 1
    pad = 2 * r + 2
    lvl = slab.reshape(tile, h, w)
    outs = []
    for i, (hl, wl) in enumerate(_level_dims(h, w, num_levels)):
        if i > 0:
            prev = _level_dims(h, w, num_levels)[i - 1]
            lvl = _pool2x2(lvl, prev[0], prev[1])
        padded = jnp.pad(lvl, ((0, 0), (pad, pad), (pad, pad)))
        sx, sy, fx, fy = _level_geometry(coords_tile, i, hl, wl, radius)

        def per_pixel(p, acc):
            patch = jax.lax.dynamic_slice(
                padded, (p, sy[p], sx[p]), (1, 2 * r + 2, 2 * r + 2))[0]
            win = _window_from_patch(patch, fx[p], fy[p], r)
            return jax.lax.dynamic_update_slice(
                acc, win.reshape(1, k * k), (p, 0))

        out_l = jax.lax.fori_loop(
            0, tile, per_pixel, jnp.zeros((tile, k * k), jnp.float32))
        outs.append(out_l)
    return jnp.concatenate(outs, axis=-1)


def _corr_kernel(f1_ref, *rest, h, w, num_levels, radius):
    """Pallas body. Correlation is LINEAR in fmap2, so the avg-pooled
    correlation pyramid equals correlating against avg-pooled fmap2 —
    the pooled levels arrive as separate inputs and each level is one
    MXU matmul written row-wise into a zero-padded scratch; per-pixel
    bilinear windows then read via pl.ds REF indexing (Mosaic supports
    dynamic slicing on refs; value dynamic_slice and lane-dim reshapes
    do not lower)."""
    f2_refs = rest[:num_levels]          # (1, hl, wl, C) each
    coords_ref = rest[num_levels]        # (1, TILE, 2) in SMEM
    out_ref = rest[num_levels + 1]
    scratch = rest[num_levels + 2:]
    f1 = f1_ref[0]                       # (TILE, C)
    c = f1.shape[-1]
    r = radius
    k = 2 * r + 1
    pad = 2 * r + 2
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.float32(c))

    for i, (hl, wl) in enumerate(_level_dims(h, w, num_levels)):
        pad_ref = scratch[i]             # (TILE, hl+2p, wl+2p)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        for y in range(hl):
            row = f2_refs[i][0, y]       # (wl, C)
            slab_row = jax.lax.dot_general(
                f1, row, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            pad_ref[:, pad + y, pad:pad + wl] = slab_row * inv_sqrt_c
        scale = jnp.float32(2 ** i)

        def per_pixel(p, _, i=i, hl=hl, wl=wl, pad_ref=pad_ref,
                      scale=scale):
            cx = coords_ref[0, p, 0] / scale
            cy = coords_ref[0, p, 1] / scale
            x0 = jnp.floor(cx)
            y0 = jnp.floor(cy)
            fx = (cx - x0).astype(jnp.float32)
            fy = (cy - y0).astype(jnp.float32)
            sx = jnp.clip(x0.astype(jnp.int32) - r + pad, 0, wl + pad)
            sy = jnp.clip(y0.astype(jnp.int32) - r + pad, 0, hl + pad)
            # Dynamic offsets on sublane/lane dims must be 8/128
            # aligned on TPU: read the pixel's whole padded slab
            # (leading-dim dynamic index is fine) and rotate the window
            # to the origin on BOTH axes (tpu.dynamic_rotate), then
            # take static slices.
            slab_p = pad_ref[p]
            rolled_y = pltpu.roll(slab_p, slab_p.shape[0] - sy, axis=0)
            rows = rolled_y[:2 * r + 2]
            rolled = pltpu.roll(rows, rows.shape[1] - sx, axis=1)
            w00 = (1 - fy) * (1 - fx)
            w01 = (1 - fy) * fx
            w10 = fy * (1 - fx)
            w11 = fy * fx
            for dy in range(k):
                r0 = rolled[dy]
                r1 = rolled[dy + 1]
                row_win = (w00 * r0[:k] + w01 * r0[1:k + 1] +
                           w10 * r1[:k] + w11 * r1[1:k + 1])
                start = i * k * k + dy * k
                out_ref[0, p, start:start + k] = row_win
            return 0

        jax.lax.fori_loop(0, f1.shape[0], per_pixel, 0)


def corr_lookup_pallas(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       coords: jnp.ndarray, num_levels: int = 4,
                       radius: int = 4, tile: int = 64,
                       interpret: bool = False) -> jnp.ndarray:
    """fmap1/fmap2: (N, H, W, C); coords: (N, H, W, 2) level-0 (x, y).
    Returns (N, H, W, num_levels*(2r+1)^2) — bitwise semantics of
    flow/raft.py build_corr_pyramid + lookup_corr."""
    n, h, w, c = fmap1.shape
    hw = h * w
    n_tiles = -(-hw // tile)
    hw_pad = n_tiles * tile
    f1 = fmap1.reshape(n, hw, c).astype(jnp.float32)
    cds = coords.reshape(n, hw, 2).astype(jnp.float32)
    if hw_pad != hw:
        f1 = jnp.pad(f1, ((0, 0), (0, hw_pad - hw), (0, 0)))
        cds = jnp.pad(cds, ((0, 0), (0, hw_pad - hw), (0, 0)))
    k2 = num_levels * (2 * radius + 1) ** 2

    # corr is linear in fmap2: pooled-corr == corr-with-pooled-fmap2,
    # so the pyramid levels are plain XLA avg-pools outside the kernel
    f2_levels = []
    f2l = fmap2.astype(jnp.float32)
    for i, (hl, wl) in enumerate(_level_dims(h, w, num_levels)):
        if i > 0:
            prev = f2_levels[-1]
            ph, pw = prev.shape[1], prev.shape[2]
            f2l = prev[:, :hl * 2, :wl * 2].reshape(
                n, hl, 2, wl, 2, c).mean(axis=(2, 4))
        f2_levels.append(f2l)

    kernel = functools.partial(_corr_kernel, h=h, w=w,
                               num_levels=num_levels, radius=radius)
    pad = 2 * radius + 2
    # lane dim padded to a 128 multiple: tpu.dynamic_rotate (the
    # window-alignment trick in the kernel) requires aligned shapes
    # sublane/lane dims padded to 8/128 multiples: tpu.dynamic_rotate
    # (the window-alignment trick in the kernel) needs aligned shapes
    scratch = [
        pltpu.VMEM((tile, -(-(hl + 2 * pad) // 8) * 8,
                    -(-(wl + 2 * pad) // 128) * 128), jnp.float32)
        for hl, wl in _level_dims(h, w, num_levels)
    ]
    f2_specs = [
        pl.BlockSpec((1, hl, wl, c), lambda b, t: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for hl, wl in _level_dims(h, w, num_levels)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *f2_specs,
            pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k2), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw_pad, k2), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw_pad * hw * c, transcendentals=0,
            bytes_accessed=4 * n * (hw_pad * c + hw * c + hw_pad * k2)),
        interpret=interpret,
    )(f1, *f2_levels, cds)
    return out[:, :hw].reshape(n, h, w, k2)


def _corr_kernel_v2(f1_ref, *rest, h, w, num_levels, radius):
    """Vectorized Pallas body (no per-pixel loop, no unaligned stores).

    The bilinear (2r+1)^2 window around per-pixel centers is two batched
    matmuls with *soft one-hot* selector matrices: for pixel p at level l
    with start (sy, sx) and fractions (fy, fx),

        Wy[p, dy, y] = (1-fy)[y == sy+dy] + fy[y == sy+dy+1]
        Wx[p, dx, x] = (1-fx)[x == sx+dx] + fx[x == sx+dx+1]
        win[p]       = Wy[p] @ slab[p] @ Wx[p]^T

    which is exactly grid_sample(zeros padding, align_corners=True):
    out-of-range rows/cols simply match nothing and contribute 0. The
    selectors come from iota comparisons (VPU), the windows from
    dot_general with a batch dim (MXU), and each level's (tile, k*k)
    result is stored at a static, lane-aligned offset.
    """
    f2_refs = rest[:num_levels]          # (1, hl, wl, C) each
    coords_ref = rest[num_levels]        # (1, TILE, 2) in VMEM
    out_ref = rest[num_levels + 1]       # (1, TILE, L, K, K)
    scratch = rest[num_levels + 2:]      # (TILE, hl, wl) per level
    f1 = f1_ref[0]                       # (TILE, C)
    tile, c = f1.shape
    r = radius
    k = 2 * r + 1
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.float32(c))
    cx0 = coords_ref[0, :, 0]            # (TILE,)
    cy0 = coords_ref[0, :, 1]

    for i, (hl, wl) in enumerate(_level_dims(h, w, num_levels)):
        # slab rows y: one MXU matmul each, written to the 3D scratch
        # (Mosaic cannot reshape a (tile, hl*wl) matmul result to 3D
        # when wl is not lane-aligned)
        for y in range(hl):
            row = f2_refs[i][0, y]       # (wl, C)
            scratch[i][:, y, :] = jax.lax.dot_general(
                f1, row, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_c
        slab3 = scratch[i][:, :, :]      # (tile, hl, wl)
        scale = jnp.float32(2 ** i)
        cx = cx0 / scale
        cy = cy0 / scale
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0).astype(jnp.float32)[:, None, None]
        fy = (cy - y0).astype(jnp.float32)[:, None, None]
        sx = x0.astype(jnp.int32)[:, None, None] - r
        sy = y0.astype(jnp.int32)[:, None, None] - r
        iy = jax.lax.broadcasted_iota(jnp.int32, (tile, k, hl), 2)
        jy = jax.lax.broadcasted_iota(jnp.int32, (tile, k, hl), 1)
        wy = ((iy == sy + jy) * (1 - fy) +
              (iy == sy + jy + 1) * fy).astype(jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile, k, wl), 2)
        jx = jax.lax.broadcasted_iota(jnp.int32, (tile, k, wl), 1)
        wx = ((ix == sx + jx) * (1 - fx) +
              (ix == sx + jx + 1) * fx).astype(jnp.float32)
        z = jax.lax.dot_general(            # (tile, k, wl)
            wy, slab3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        win = jax.lax.dot_general(          # (tile, k, k)
            z, wx, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # Mosaic supports neither (tile,k,k)->(tile,k*k) reshapes nor
        # unaligned lane concats; store each window row at its own
        # (level, dy) slot instead — every store is origin-aligned
        for dy in range(k):
            out_ref[0, :, i, dy, :] = win[:, dy, :]


def corr_lookup_pallas_v2(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                          coords: jnp.ndarray, num_levels: int = 4,
                          radius: int = 4, tile: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """Full-scale-capable Pallas correlation lookup (see _corr_kernel_v2).
    Same numerics as build_corr_pyramid + lookup_corr / corr_lookup_scan;
    returns (N, H, W, num_levels*(2r+1)^2)."""
    n, h, w, c = fmap1.shape
    hw = h * w
    n_tiles = -(-hw // tile)
    hw_pad = n_tiles * tile
    f1 = fmap1.reshape(n, hw, c).astype(jnp.float32)
    cds = coords.reshape(n, hw, 2).astype(jnp.float32)
    if hw_pad != hw:
        f1 = jnp.pad(f1, ((0, 0), (0, hw_pad - hw), (0, 0)))
        cds = jnp.pad(cds, ((0, 0), (0, hw_pad - hw), (0, 0)))
    k = 2 * radius + 1

    f2_levels = []
    for i, (hl, wl) in enumerate(_level_dims(h, w, num_levels)):
        if i == 0:
            f2l = fmap2.astype(jnp.float32)
        else:
            prev = f2_levels[-1]
            f2l = prev[:, :hl * 2, :wl * 2].reshape(
                n, hl, 2, wl, 2, c).mean(axis=(2, 4))
        f2_levels.append(f2l)

    kernel = functools.partial(_corr_kernel_v2, h=h, w=w,
                               num_levels=num_levels, radius=radius)
    f2_specs = [
        pl.BlockSpec((1, hl, wl, c), lambda b, t: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for hl, wl in _level_dims(h, w, num_levels)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            *f2_specs,
            pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, num_levels, k, k),
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw_pad, num_levels, k, k),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, hl, wl), jnp.float32)
            for hl, wl in _level_dims(h, w, num_levels)
        ],
        # the resident f2 pyramid (f32, C=256 at RAFT scale) plus the
        # slab scratch exceed the 16 MB default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * n * hw_pad * hw * c * 1.34),
            transcendentals=0,
            bytes_accessed=4 * n * (hw_pad * c + hw * c +
                                    hw_pad * num_levels * k * k)),
        interpret=interpret,
    )(f1, *f2_levels, cds)
    return out[:, :hw].reshape(n, h, w, num_levels * k * k)


def corr_lookup_scan(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                     coords: jnp.ndarray, num_levels: int = 4,
                     radius: int = 4, tile: int = 64) -> jnp.ndarray:
    """Pure-XLA memory-efficient fallback: lax.scan over pixel tiles,
    one (tile, H*W) slab alive at a time. Same numerics as the kernel."""
    n, h, w, c = fmap1.shape
    hw = h * w
    n_tiles = -(-hw // tile)
    hw_pad = n_tiles * tile
    f1 = fmap1.reshape(n, hw, c).astype(jnp.float32)
    f2 = fmap2.reshape(n, hw, c).astype(jnp.float32)
    cds = coords.reshape(n, hw, 2).astype(jnp.float32)
    if hw_pad != hw:
        f1 = jnp.pad(f1, ((0, 0), (0, hw_pad - hw), (0, 0)))
        cds = jnp.pad(cds, ((0, 0), (0, hw_pad - hw), (0, 0)))
    f1 = f1.reshape(n, n_tiles, tile, c)
    cds = cds.reshape(n, n_tiles, tile, 2)

    def per_batch(f1_b, f2_b, cds_b):
        def step(_, inp):
            f1_t, cds_t = inp
            slab = jnp.dot(f1_t, f2_b.T,
                           preferred_element_type=jnp.float32)
            slab = slab / jnp.sqrt(jnp.float32(c))
            return None, _lookup_tile(slab, cds_t, h, w, num_levels,
                                      radius)

        _, out = jax.lax.scan(step, None, (f1_b, cds_b))
        return out

    out = jax.vmap(per_batch)(f1, f2, cds)   # (n, n_tiles, tile, k2)
    k2 = num_levels * (2 * radius + 1) ** 2
    return out.reshape(n, hw_pad, k2)[:, :hw].reshape(n, h, w, k2)
