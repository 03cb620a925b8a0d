"""Scatter-bin Pallas rasteriser: per-tile subchunk lists replace
chunk-bbox culling.

The direct kernel (pallas_raster_direct.py) culls at 256-triangle chunk
granularity: every pixel tile tests every chunk's screen bbox and, on
overlap, evaluates coverage for ALL 256 triangles of the chunk — at YCB
scale roughly half the (triangle x pixel) cross product survives. Finer
chunks with more `lax.cond`s measured SLOWER (round-2 roofline note):
the per-cond overhead dominates once chunks shrink.

This kernel replaces the cond-ladder with the TPU-native equivalent of
the CUDA binning prepass the reference's grid launch implies
(image_renderer.cuh:59-209 rasterises each triangle only over its own
bbox; a TPU kernel cannot scatter per-triangle, but it CAN scatter
per-subchunk indices in scalar memory):

  1. setup (vector): identical per-triangle coefficient pipeline as the
     direct kernel, PLUS per-subchunk (G=16 morton-adjacent triangles)
     screen bboxes via a segmented lane-min/max (log2 G masked
     roll-reduce steps on the [8, T] coordinate stack), converted in
     vector form to pixel-tile index ranges;
  2. one small VMEM->SMEM DMA moves the [8, n_sub] tile ranges into
     scalar memory;
  3. bin (scalar): for each subchunk, append its index to the SMEM list
     of every tile in its range — O(total overlaps) scalar stores, the
     "scatter" TPUs do have;
  4. raster (vector): each 2D pixel tile loops over ITS OWN list with a
     dynamic trip count — every iteration does real coverage work on a
     [G, tile_pix] block; no conds, no dead chunks.

Tiles are 2D (8 rows x 16 cols = 128 px = full lane width) so subchunk
bboxes cull in both axes; the caller unscrambles the tile-major output
with a static permutation (one XLA gather). Output keys are bit-identical
to the direct kernel (same packed w-max epilogue, same tie-breaks) for
every pixel both kernels cover; see tests/test_perf_kernels.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perception_tpu.ops.rasterizer import (
    _INVALID_KEY,
    _MAX_DEPTH,
    MAX_TRIS,
    TRI_ID_BITS,
)

# Defaults (overridable per call; sweep measured on v5e — see module
# docstring).
TILE_H = 8        # ROI rows per pixel tile
TILE_W = 16       # ROI cols per pixel tile
SUB_G = 16        # triangles per binned subchunk
TRI_CHUNK = 256   # setup-phase chunk (same as direct kernel)


def _kernel(anchor_ref, mid_ref, verts_ref, pose_ref, proj_ref, out_ref,
            coef_ref, rng_vmem_ref, rng_smem_ref, lists_ref, counts_ref,
            dma_sem, *, width, height, stride, n_chunks, tri_chunk,
            n_sub, ntx, nty, roi_w, roi_h, sub_g, tile_h, tile_w):
    pose_i = pl.program_id(0)
    x0 = anchor_ref[pose_i, 0]
    y0 = anchor_ref[pose_i, 1]
    n_tiles = ntx * nty
    tile_pix = tile_h * tile_w

    p = [pose_ref[0, 0, i] for i in range(12)]    # model->camera 3x4 (m)
    pr = [proj_ref[0, i] for i in range(12)]      # projection rows 0..2

    # ---- Phase 1: per-triangle setup + per-subchunk tile ranges ----
    def setup_chunk(k, _):
        sl = pl.ds(k * tri_chunk, tri_chunk)
        valid = verts_ref[0, 9:10, sl] > 0.5       # [1, TT]
        cullable = verts_ref[0, 10:11, sl] > 0.5

        def cam(ix):
            vx = verts_ref[0, 3 * ix:3 * ix + 1, sl]
            vy = verts_ref[0, 3 * ix + 1:3 * ix + 2, sl]
            vz = verts_ref[0, 3 * ix + 2:3 * ix + 3, sl]
            cx = p[0] * vx + p[1] * vy + p[2] * vz + p[3]
            cy = p[4] * vx + p[5] * vy + p[6] * vz + p[7]
            cz = p[8] * vx + p[9] * vy + p[10] * vz + p[11]
            return cx, cy, cz

        x0m, y0m, z0m = cam(0)
        x1m, y1m, z1m = cam(1)
        x2m, y2m, z2m = cam(2)

        e1x, e1y, e1z = x1m - x0m, y1m - y0m, z1m - z0m
        e2x, e2y, e2z = x2m - x0m, y2m - y0m, z2m - z0m
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        facing = (nx * x0m + ny * y0m + nz * z0m) < 0.0
        ok = valid & (facing | ~cullable)

        z0c, z1c, z2c = z0m * 100.0, z1m * 100.0, z2m * 100.0
        ok &= (z0c > 1e-3) & (z1c > 1e-3) & (z2c > 1e-3)

        def screen(xm, ym, zc):
            xc, yc = xm * 100.0, ym * 100.0
            clip_x = xc * pr[0] + yc * pr[1] + zc * pr[2] + pr[3]
            clip_y = yc * pr[5] + zc * pr[6] + pr[7]
            zdiv = jnp.where(zc > 1e-3, zc, 1.0)
            sx = clip_x / zdiv * (width / 2.0) + width / 2.0
            sy = clip_y / zdiv * (height / 2.0) + height / 2.0
            return sx, sy

        sx0, sy0 = screen(x0m, y0m, z0c)
        sx1, sy1 = screen(x1m, y1m, z1c)
        sx2, sy2 = screen(x2m, y2m, z2c)

        e20x, e20y = sx2 - sx0, sy2 - sy0
        e10x, e10y = sx1 - sx0, sy1 - sy0
        base = 0.5 * (e20x * e10y - e10x * e20y)
        ok &= jnp.abs(base) > 1e-2
        sign = jnp.where(base >= 0, 1.0, -1.0)
        inv_base = jnp.where(ok, 1.0 / jnp.where(ok, base, 1.0), 0.0)

        beta_x = -0.5 * e20y * sign
        beta_y = 0.5 * e20x * sign
        beta_c = 0.5 * (sx0 * e20y - sy0 * e20x) * sign
        gamma_x = 0.5 * e10y * sign
        gamma_y = -0.5 * e10x * sign
        gamma_c = 0.5 * (sy0 * e10x - sx0 * e10y) * sign

        iz0 = jnp.where(ok, 1.0 / jnp.where(ok, z0c, 1.0), 0.0)
        iz1 = jnp.where(ok, 1.0 / jnp.where(ok, z1c, 1.0), 0.0)
        iz2 = jnp.where(ok, 1.0 / jnp.where(ok, z2c, 1.0), 0.0)
        d1, d2 = iz1 - iz0, iz2 - iz0
        w_x = (beta_x * sign * d1 + gamma_x * sign * d2) * inv_base
        w_y = (beta_y * sign * d1 + gamma_y * sign * d2) * inv_base
        w_c = iz0 + (beta_c * sign * d1 + gamma_c * sign * d2) * inv_base
        # Degenerate-coefficient guard hoisted out of the raster loop: a
        # finite affine w(px, py) needs finite coefficients, so one check
        # per TRIANGLE here replaces a per-(tri, pixel) isfinite test.
        ok &= (jnp.isfinite(w_x) & jnp.isfinite(w_y) & jnp.isfinite(w_c)
               & jnp.isfinite(beta_c) & jnp.isfinite(gamma_c))

        abs_base = jnp.where(ok, jnp.abs(base), -jnp.inf)
        alpha_x = -beta_x - gamma_x
        alpha_y = -beta_y - gamma_y
        alpha_c = abs_base - beta_c - gamma_c

        # Per-subchunk screen bboxes: segmented min/max over lane segments
        # of SUB_G via masked roll-doubling (the segment's reduction lands
        # on its FIRST lane; other lanes hold garbage partials).
        big = jnp.float32(3e38)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, tri_chunk), 1)
        seg_pos = lane % sub_g
        zero2 = jnp.zeros((2, tri_chunk), jnp.float32)
        coords = jnp.concatenate([sx0, sx1, sx2, sy0, sy1, sy2, zero2],
                                 axis=0)                       # [8, TT]
        mn = jnp.where(ok, coords, big)
        mx = jnp.where(ok, coords, -big)
        shift = 1
        while shift < sub_g:
            # Left-circular shift by `shift` == roll right by size-shift
            # (pltpu.roll only accepts non-negative shifts).
            keep = seg_pos < (sub_g - shift)
            mn = jnp.minimum(mn, jnp.where(
                keep, pltpu.roll(mn, tri_chunk - shift, axis=1), big))
            mx = jnp.maximum(mx, jnp.where(
                keep, pltpu.roll(mx, tri_chunk - shift, axis=1), -big))
            shift *= 2

        sxmin = (jnp.minimum(mn[0:1], jnp.minimum(mn[1:2], mn[2:3]))
                 - 1.0)                                        # [1, TT]
        sxmax = jnp.maximum(mx[0:1], jnp.maximum(mx[1:2], mx[2:3])) + 1.0
        symin = jnp.minimum(mn[3:4], jnp.minimum(mn[4:5], mn[5:6])) - 1.0
        symax = jnp.maximum(mx[3:4], jnp.maximum(mx[4:5], mx[5:6])) + 1.0

        # Screen bbox -> inclusive tile-index ranges, in vector form.
        # ROI col = px/stride - x0 (px increasing), ROI row =
        # (height-1 - py)/stride - y0 (py DEcreasing with row).
        fx0 = x0.astype(jnp.float32)
        fy0 = y0.astype(jnp.float32)
        cx0 = sxmin / stride - fx0
        cx1 = sxmax / stride - fx0
        ry0 = (height - 1 - symax) / stride - fy0
        ry1 = (height - 1 - symin) / stride - fy0
        empty = sxmin > sxmax     # no valid triangle in subchunk
        # Clamp into tile space; mark empty/off-ROI with tx0 > tx1.
        off = empty | (cx1 < 0) | (cx0 > roi_w - 1) | (ry1 < 0) \
            | (ry0 > roi_h - 1)
        tx0 = jnp.clip(jnp.floor(cx0 / tile_w), 0, ntx - 1)
        tx1 = jnp.clip(jnp.floor(cx1 / tile_w), 0, ntx - 1)
        ty0 = jnp.clip(jnp.floor(ry0 / tile_h), 0, nty - 1)
        ty1 = jnp.clip(jnp.floor(ry1 / tile_h), 0, nty - 1)
        tx0 = jnp.where(off, 1.0, tx0)
        tx1 = jnp.where(off, 0.0, tx1)
        ranges = jnp.concatenate(
            [tx0, tx1, ty0, ty1,
             jnp.zeros((4, tri_chunk), jnp.float32)], axis=0)  # [8, TT]
        rng_vmem_ref[:, pl.ds(k * tri_chunk, tri_chunk)] = (
            ranges.astype(jnp.int32))

        stacked = jnp.concatenate(
            [beta_x, beta_y, beta_c, gamma_x, gamma_y, gamma_c,
             alpha_x, alpha_y, alpha_c, w_x, w_y, w_c,
             jnp.zeros((4, tri_chunk), jnp.float32)], axis=0)   # [16, TT]
        coef_ref[pl.ds(k * tri_chunk, tri_chunk), :] = stacked.T
        return 0

    jax.lax.fori_loop(0, n_chunks, setup_chunk, 0)

    # ---- Phase 2: tile ranges to scalar memory (one small DMA) ----
    dma = pltpu.make_async_copy(rng_vmem_ref, rng_smem_ref, dma_sem)
    dma.start()
    dma.wait()

    # ---- Phase 3: scalar scatter-bin into per-tile lists ----
    def clear_tile(t, _):
        counts_ref[t] = 0
        return 0

    jax.lax.fori_loop(0, n_tiles, clear_tile, 0)

    def bin_sub(s, _):
        lane0 = s * sub_g
        tx0 = rng_smem_ref[0, lane0]
        tx1 = rng_smem_ref[1, lane0]
        ty0 = rng_smem_ref[2, lane0]
        ty1 = rng_smem_ref[3, lane0]

        def ty_body(ty, _):
            def tx_body(tx, _):
                t = ty * ntx + tx
                c = counts_ref[t]
                lists_ref[t, c] = s
                counts_ref[t] = c + 1
                return 0

            jax.lax.fori_loop(tx0, tx1 + 1, tx_body, 0)
            return 0

        jax.lax.fori_loop(ty0, ty1 + 1, ty_body, 0)
        return 0

    jax.lax.fori_loop(0, n_sub, bin_sub, 0)

    # ---- Phase 4: per-tile raster over the binned subchunks only ----
    id_mask = jnp.int32(MAX_TRIS - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, tile_pix), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_g, tile_pix), 0)

    def tile_body(j, _):
        tj_y = j // ntx
        tj_x = j % ntx
        px = ((x0 + tj_x * tile_w + q % tile_w) * stride).astype(jnp.float32)
        py = (height - 1
              - (y0 + tj_y * tile_h + q // tile_w) * stride).astype(
                  jnp.float32)

        def sub_body(i, best):
            s = lists_ref[j, i]
            c = coef_ref[pl.ds(s * sub_g, sub_g), :]       # [G, 16]
            beta = c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]
            gamma = c[:, 3:4] * px + c[:, 4:5] * py + c[:, 5:6]
            alpha = c[:, 6:7] * px + c[:, 7:8] * py + c[:, 8:9]
            w = c[:, 9:10] * px + c[:, 10:11] * py + c[:, 11:12]
            covered = jnp.minimum(alpha, jnp.minimum(beta, gamma)) >= 0.0
            ids = s * sub_g + sub_iota
            wkey = ((jax.lax.bitcast_convert_type(w, jnp.int32)
                     & ~id_mask) | (id_mask - ids))
            cand = jnp.where(covered, wkey, 0)
            return jnp.maximum(best, cand.max(axis=0, keepdims=True))

        init = jnp.zeros((1, tile_pix), dtype=jnp.int32)
        best = jax.lax.fori_loop(0, counts_ref[j], sub_body, init)

        found = best > 0
        w_win = jax.lax.bitcast_convert_type(
            (best & ~id_mask) | jnp.int32(1 << (TRI_ID_BITS - 1)),
            jnp.float32)
        tid = id_mask - (best & id_mask)
        depth_i = jnp.clip(jnp.round(1.0 / w_win), 1.0,
                           float(_MAX_DEPTH)).astype(jnp.int32)
        keys = jnp.where(found, (depth_i << TRI_ID_BITS) | tid,
                         jnp.int32(_INVALID_KEY))
        out_ref[0, j, :] = keys[0, :]
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.lru_cache(maxsize=None)
def _tile_perm(roi_h: int, roi_w: int, tile_h: int, tile_w: int) -> np.ndarray:
    """Flat ROI pixel index -> (tile, within-tile) position."""
    ntx = -(-roi_w // tile_w)
    y, x = np.mgrid[0:roi_h, 0:roi_w]
    j = (y // tile_h) * ntx + x // tile_w
    qq = (y % tile_h) * tile_w + x % tile_w
    return (j * (tile_h * tile_w) + qq).reshape(-1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("width", "height", "stride",
                                             "roi_shape", "interpret",
                                             "sub_g", "tile_h", "tile_w"))
def rasterize_bin_pallas(
    verts16: jax.Array,     # [M, 16, T] packed bank (pack_bank_verts)
    pose_mats: jax.Array,   # [N, 4, 4] model->camera (m)
    model_ids: jax.Array,   # [N] int32
    anchors: jax.Array,     # [N, 2] int32 strided ROI origin
    proj: jax.Array,        # [4, 4]
    *,
    width: int,
    height: int,
    stride: int,
    roi_shape: tuple[int, int] | None = None,
    interpret: bool = False,
    sub_g: int = SUB_G,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
) -> jax.Array:
    """Packed (depth << TRI_ID_BITS | tri_id) keys [N, Npix]."""
    n = pose_mats.shape[0]
    if n > 1024:
        outs = []
        for lo in range(0, n, 1024):
            hi = min(lo + 1024, n)
            outs.append(rasterize_bin_pallas(
                verts16, pose_mats[lo:hi], model_ids[lo:hi],
                anchors[lo:hi], proj, width=width, height=height,
                stride=stride, roi_shape=roi_shape, interpret=interpret,
                sub_g=sub_g, tile_h=tile_h, tile_w=tile_w))
        return jnp.concatenate(outs, axis=0)
    t = verts16.shape[2]
    tri_chunk = min(TRI_CHUNK, t)
    if t % tri_chunk:
        pad = tri_chunk - t % tri_chunk
        verts16 = jnp.pad(verts16, ((0, 0), (0, 0), (0, pad)))
        t += pad
    n_chunks = t // tri_chunk
    n_sub = t // sub_g

    if roi_shape is None:
        roi_h, roi_w = height // stride, width // stride
        anchors = jnp.zeros((n, 2), jnp.int32)
    else:
        roi_h, roi_w = roi_shape
    npix = roi_h * roi_w
    ntx = -(-roi_w // tile_w)
    nty = -(-roi_h // tile_h)
    n_tiles = ntx * nty
    tile_pix = tile_h * tile_w

    pose16 = jnp.zeros((n, 8, 16), jnp.float32)
    pose16 = pose16.at[:, 0, :12].set(pose_mats[:, :3, :].reshape(n, 12))
    proj16 = jnp.zeros((8, 16), jnp.float32)
    proj16 = proj16.at[0, :12].set(proj[:3, :].reshape(12))

    kernel = functools.partial(
        _kernel, width=width, height=height, stride=stride,
        n_chunks=n_chunks, tri_chunk=tri_chunk, n_sub=n_sub,
        ntx=ntx, nty=nty, roi_w=roi_w, roi_h=roi_h,
        sub_g=sub_g, tile_h=tile_h, tile_w=tile_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # anchors, model_ids
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 16, t),
                         lambda i, anchors_ref, mid_ref: (mid_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 16), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_tiles, tile_pix),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, 16), jnp.float32),        # coefficients
            pltpu.VMEM((8, t), jnp.int32),           # tile ranges (vector)
            pltpu.SMEM((8, t), jnp.int32),           # tile ranges (scalar)
            pltpu.SMEM((n_tiles, n_sub), jnp.int32),  # per-tile lists
            pltpu.SMEM((max(8, n_tiles),), jnp.int32),  # per-tile counts
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, tile_pix), jnp.int32),
        interpret=interpret,
    )(anchors.astype(jnp.int32), model_ids.astype(jnp.int32),
      verts16, pose16, proj16)
    perm = jnp.asarray(_tile_perm(roi_h, roi_w, tile_h, tile_w))
    return out.reshape(n, n_tiles * tile_pix)[:, perm]
