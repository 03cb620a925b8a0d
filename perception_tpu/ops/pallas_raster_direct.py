"""Fully-fused Pallas rasteriser: model bank in, packed keys out.

The two-stage path (rasterizer.py setup -> pallas_raster.py kernel)
materialises per-pose coefficient tables in HBM (~25 MB and ~30 elementwise
passes for a 512-pose batch — several ms of bandwidth, comparable to the
raster compute itself after culling). This kernel moves the whole
per-triangle pipeline on-chip:

    bank vertices (selected per pose via scalar-prefetch block indexing —
    no [N, T] gather, no per-pose HBM coefficient table)
      -> camera transform (pose scalars)
      -> backface cull (watertight models)
      -> projection + affine coverage/depth coefficients
      -> per-chunk screen bbox
      -> chunk x pixel-tile culled packed-min rasterisation

Layout (the part that matters on an 8x128 VPU):
  * the bank is stored component-major [M, 16, T] so every per-triangle
    setup op is a [1, TT] lane vector (a first triangle-major [TT, 1]
    attempt ran the ~150 setup ops at 1/128 lane utilisation and measured
    2x SLOWER end-to-end than the two-stage path);
  * setup runs once per chunk and lands in a sublane-major [T, 16] VMEM
    scratch via one [16, TT] -> [TT, 16] transpose per chunk; chunk screen
    bboxes go to SMEM;
  * the raster phase is then identical to pallas_raster._raster_kernel
    (tile-outer / chunk-inner, packed min carried in registers, culled by
    the SMEM bboxes) reading the scratch instead of an HBM table.

A pixels-on-sublanes variant that avoids the transpose was also measured
SLOWER (10.2 vs 5.9 ms/512-pose batch): the [PIX, 1] output stores and
full-buffer init at 1/128 lane density dominate once culling has removed
most of the coverage work. This transpose variant measures ~4% faster than
the two-stage path (5.65 vs 5.88 ms) while removing the ~25 MB/batch HBM
coefficient round-trip. Semantics match rasterizer.py's setup
(screen_vertices / triangle_coefficients; image_renderer.cuh:59-321 parity
— see rasterizer.py docstrings for the reference mapping) except for f32
FMA association flips at ~0.8% of silhouette-edge pixels.

Inputs:
  * verts16 [M, 16, T]: rows = (v0x v0y v0z v1x v1y v1z v2x v2y v2z,
    valid, cullable, 5 pad rows), static per bank;
  * pose16 [N, 8, 16]: row 0 = flattened model->camera 3x4 (metres);
  * proj16 [8, 16]: row 0 = flattened projection rows 0..2;
  * scalar-prefetched anchors [N, 2] and model ids [N].
"""

from __future__ import annotations

import functools

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

# Chunk/tile geometry (PT_TRI_CHUNK / PT_TILE_PIX env A/B knobs; 256/256
# measured best in round 2 — but that was with bank-order triangle chunks,
# whose bboxes cover the whole model. Triangles are morton-sorted at bank
# build since round 3, so SMALLER chunks now mean spatially tight bboxes:
# at the render_lod=256 default a 256-triangle model is a single chunk
# (bbox = whole model, culling never fires), while TRI_CHUNK=64 gives four
# locally-tight bboxes per model. Re-priced on the chip each round.)
import os as _os

TILE_PIX = int(_os.environ.get("PT_TILE_PIX", 256))
TRI_CHUNK = int(_os.environ.get("PT_TRI_CHUNK", 256))
# Sub-chunk bbox granularity (PT_SUB_BBOX, 0 = off): keep the [16, 256]
# setup transpose (full-lane) but cull and rasterise per SUB_BBOX-triangle
# morton-local slice. Re-pricing TRI_CHUNK=64 post-morton measured SLOWER
# because the finer setup transposes run at half lane utilisation; this
# keeps setup at 256 and only splits the raster loop, which is
# associativity-exact (same packed-min result).
#
# On-chip A/B at the bumpy1024 bench, round 4 (baseline 61.1k poses/s):
# 64 -> 61.3k (+0.3%, noise), 32 -> 59.7k (-2%), and 128 -> 2.66k — a
# 26x SLOWDOWN despite being a valid divisor of TRI_CHUNK (Mosaic lowers
# the [16, 128] slice loop pathologically). Off by default; do not ship
# 128.
SUB_BBOX = int(_os.environ.get("PT_SUB_BBOX", 0))
# Scalar-prefetch operands live in SMEM scoped to the whole grid; beyond
# this many poses the anchors/ids buffer blows the 1 MB SMEM budget
# (measured: 1.01M at N=2048), so larger batches run the kernel per
# SUB_BATCH slice under lax.map.
SUB_BATCH = 1024


def _kernel(anchor_ref, mid_ref, verts_ref, pose_ref, proj_ref, out_ref,
            coef_ref, bbox_ref, *, width, height, stride, n_chunks, n_tiles,
            tri_chunk, roi_w, tile_pix, sub, n_sub):
    pose_i = pl.program_id(0)
    x0 = anchor_ref[pose_i, 0]
    y0 = anchor_ref[pose_i, 1]

    p = [pose_ref[0, 0, i] for i in range(12)]    # model->camera 3x4 (m)
    pr = [proj_ref[0, i] for i in range(12)]      # projection rows 0..2

    # Phase 1: per-triangle setup, all chunks, into the sublane-major
    # coefficient scratch (one [16, TT] -> [TT, 16] transpose per chunk).
    def setup_chunk(k, _):
        sl = pl.ds(k * tri_chunk, tri_chunk)
        valid = verts_ref[0, 9:10, sl] > 0.5       # [1, TT]
        cullable = verts_ref[0, 10:11, sl] > 0.5

        def cam(ix):  # camera-frame vertex ix, metres (as setup_one)
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

        # Backface (camera at origin): facing iff normal . v0 < 0
        # (rasterizer.py setup_one; exact for watertight outward meshes).
        e1x, e1y, e1z = x1m - x0m, y1m - y0m, z1m - z0m
        e2x, e2y, e2z = x2m - x0m, y2m - y0m, z2m - z0m
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        facing = (nx * x0m + ny * y0m + nz * z0m) < 0.0
        ok = valid & (facing | ~cullable)

        # m -> cm render units, then project (screen_vertices).
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

        # triangle_coefficients, inlined on [1, TT] lane vectors.
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

        abs_base = jnp.where(ok, jnp.abs(base), -jnp.inf)
        # Alpha as its own affine function (alpha = |base| - beta - gamma):
        # the raster loop then tests coverage with a single
        # min(alpha, beta, gamma) >= 0 instead of three comparisons, and
        # invalid triangles auto-fail through alpha_c = -inf.
        alpha_x = -beta_x - gamma_x
        alpha_y = -beta_y - gamma_y
        alpha_c = abs_base - beta_c - gamma_c

        # Screen bbox per SUB-triangle morton-local slice (+1 px margin),
        # for exact tile culling (a covered sample lies inside its
        # triangle's bbox). The six coordinate columns reduce TOGETHER as
        # stacked [8, SUB] mins + maxes (sublane rows reduce in parallel
        # on the VPU) instead of 24 independent cross-lane reductions.
        # n_sub == 1 is the classic whole-chunk bbox.
        big = jnp.float32(3e38)
        zero2 = jnp.zeros((2, tri_chunk), jnp.float32)
        coords = jnp.concatenate([sx0, sx1, sx2, sy0, sy1, sy2, zero2],
                                 axis=0)                       # [8, TT]
        mn_in = jnp.where(ok, coords, big)
        mx_in = jnp.where(ok, coords, -big)
        for s in range(n_sub):
            lanes = slice(s * sub, (s + 1) * sub)
            mns = jnp.min(mn_in[:, lanes], axis=1)             # [8]
            mxs = jnp.max(mx_in[:, lanes], axis=1)
            b = k * n_sub + s
            bbox_ref[0, b] = jnp.minimum(
                mns[0], jnp.minimum(mns[1], mns[2])) - 1.0
            bbox_ref[1, b] = jnp.maximum(
                mxs[0], jnp.maximum(mxs[1], mxs[2])) + 1.0
            bbox_ref[2, b] = jnp.minimum(
                mns[3], jnp.minimum(mns[4], mns[5])) - 1.0
            bbox_ref[3, b] = jnp.maximum(
                mxs[3], jnp.maximum(mxs[4], mxs[5])) + 1.0

        stacked = jnp.concatenate(
            [beta_x, beta_y, beta_c, gamma_x, gamma_y, gamma_c,
             alpha_x, alpha_y, alpha_c, w_x, w_y, w_c,
             jnp.zeros((4, tri_chunk), jnp.float32)], axis=0)   # [16, TT]
        coef_ref[pl.ds(k * tri_chunk, tri_chunk), :] = stacked.T
        return 0

    jax.lax.fori_loop(0, n_chunks, setup_chunk, 0)

    # Phase 2: tile-outer / chunk-inner rasterisation with the running
    # packed min in registers (identical to pallas_raster._raster_kernel,
    # reading the scratch coefficient table).
    tx_min = (x0 * stride).astype(jnp.float32)
    tx_max = ((x0 + roi_w - 1) * stride).astype(jnp.float32)

    def tile_body(j, _):
        flat = j * tile_pix + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile_pix), 1)
        px = ((x0 + flat % roi_w) * stride).astype(jnp.float32)
        py = (height - 1 - (y0 + flat // roi_w) * stride).astype(jnp.float32)
        r0 = (j * tile_pix) // roi_w
        r1 = (j * tile_pix + tile_pix - 1) // roi_w
        ty_max = (height - 1 - (y0 + r0) * stride).astype(jnp.float32)
        ty_min = (height - 1 - (y0 + r1) * stride).astype(jnp.float32)

        id_mask = jnp.int32(MAX_TRIS - 1)

        def chunk_body(k, best):
            # Cull + rasterise per SUB-triangle slice (static unroll; the
            # packed-max merge is associative so the split is exact).
            for s in range(n_sub):
                b = k * n_sub + s
                overlap = ((bbox_ref[0, b] <= tx_max)
                           & (bbox_ref[1, b] >= tx_min)
                           & (bbox_ref[2, b] <= ty_max)
                           & (bbox_ref[3, b] >= ty_min))

                def compute(best, s=s):
                    # Inverse-depth (w) max packing: the nearest triangle
                    # has the LARGEST w, and positive f32 bits are
                    # order-preserving as int32, so the whole depth
                    # resolution (reciprocal, rounding, clipping, shifting)
                    # moves out of the (triangle x pixel) loop into a
                    # once-per-pixel epilogue. The low TRI_ID_BITS mantissa
                    # bits carry the COMPLEMENTED triangle id (ties resolve
                    # toward the smaller id, matching the reference's
                    # min-key tie-break) at a w quantisation of 2^-12
                    # relative — resolved depth moves by <= 0.25 mm at 1 m,
                    # de-biased by the half-step in the epilogue.
                    lo = k * tri_chunk + s * sub
                    c = coef_ref[pl.ds(lo, sub), :]             # [SUB, 16]
                    beta = c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]
                    gamma = c[:, 3:4] * px + c[:, 4:5] * py + c[:, 5:6]
                    alpha = c[:, 6:7] * px + c[:, 7:8] * py + c[:, 8:9]
                    w = c[:, 9:10] * px + c[:, 10:11] * py + c[:, 11:12]
                    # Non-positive w loses naturally (negative int bits < 0
                    # init), but +Inf/NaN w — a vertex at/crossing the
                    # camera plane that survives upstream culling —
                    # bitcasts to a huge positive key and would win with a
                    # bogus near depth; the isfinite-and-positive term
                    # fuses into the min-compare.
                    covered = ((jnp.minimum(alpha, jnp.minimum(beta, gamma))
                                >= 0.0)
                               & jnp.isfinite(w) & (w > 0.0))
                    ids = (lo + jax.lax.broadcasted_iota(
                        jnp.int32, (sub, tile_pix), 0))
                    wkey = ((jax.lax.bitcast_convert_type(w, jnp.int32)
                             & ~id_mask) | (id_mask - ids))
                    cand = jnp.where(covered, wkey, 0)
                    return jnp.maximum(best, cand.max(axis=0, keepdims=True))

                best = jax.lax.cond(overlap, compute, lambda b: b, best)
            return best

        init = jnp.zeros((1, tile_pix), dtype=jnp.int32)
        best = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        # Epilogue: resolve the winning w back to a rounded int-cm depth key
        # (depth << TRI_ID_BITS | tri_id), once per pixel.
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


def pack_bank_verts(bank_tri_verts: jax.Array, bank_tri_valid: jax.Array,
                    bank_backface: jax.Array | None) -> jax.Array:
    """[M, 16, T] component-major static vertex pack (see module docstring)."""
    m, t = bank_tri_valid.shape
    comp = jnp.transpose(
        bank_tri_verts.reshape(m, t, 9).astype(jnp.float32), (0, 2, 1))
    valid = bank_tri_valid.astype(jnp.float32)[:, None, :]
    if bank_backface is None:
        cull = jnp.zeros((m, 1, t), jnp.float32)
    else:
        cull = jnp.broadcast_to(
            bank_backface.astype(jnp.float32)[:, None, None], (m, 1, t))
    pad = jnp.zeros((m, 5, t), jnp.float32)
    return jnp.concatenate([comp, valid, cull, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("width", "height", "stride",
                                             "roi_shape", "interpret"))
def rasterize_direct_pallas(
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
) -> jax.Array:
    """Packed (depth << TRI_ID_BITS | tri_id) keys [N, Npix]."""
    n = pose_mats.shape[0]
    if n > SUB_BATCH:
        # The kernel is per-pose, so slicing the batch is exact. Run the
        # slices under lax.map rather than an unrolled Python loop: the
        # program then contains ONE pallas_call instance instead of
        # n/SUB_BATCH copies, which cuts trace+lower time at N=2048 from
        # ~14 s to the single-instance ~0.2 s (each copy re-runs the
        # Mosaic lowering pipeline) at identical runtime semantics.
        if n % SUB_BATCH:
            # Ragged tail: unrolled calls (the tail slice is a different
            # pallas instance anyway). Only non-multiple batches pay this.
            outs = []
            for lo in range(0, n, SUB_BATCH):
                hi = min(lo + SUB_BATCH, n)
                outs.append(rasterize_direct_pallas(
                    verts16, pose_mats[lo:hi], model_ids[lo:hi],
                    anchors[lo:hi], proj, width=width, height=height,
                    stride=stride, roi_shape=roi_shape, interpret=interpret))
            return jnp.concatenate(outs, axis=0)
        k = n // SUB_BATCH
        out = jax.lax.map(
            lambda s: rasterize_direct_pallas(
                verts16, s[0], s[1], s[2], proj, width=width,
                height=height, stride=stride, roi_shape=roi_shape,
                interpret=interpret),
            (pose_mats.reshape(k, SUB_BATCH, 4, 4),
             model_ids.astype(jnp.int32).reshape(k, SUB_BATCH),
             anchors.astype(jnp.int32).reshape(k, SUB_BATCH, 2)))
        return out.reshape(n, -1)
    t = verts16.shape[2]
    tri_chunk = min(TRI_CHUNK, t)
    if t % tri_chunk:
        pad = tri_chunk - t % tri_chunk
        verts16 = jnp.pad(verts16, ((0, 0), (0, 0), (0, pad)))
        t += pad
    n_chunks = t // tri_chunk

    if roi_shape is None:
        roi_h, roi_w = height // stride, width // stride
        anchors = jnp.zeros((n, 2), jnp.int32)
    else:
        roi_h, roi_w = roi_shape
    npix = roi_h * roi_w
    tile_pix = min(TILE_PIX, max(128, npix))
    n_tiles = (npix + tile_pix - 1) // tile_pix

    pose16 = jnp.zeros((n, 8, 16), jnp.float32)
    pose16 = pose16.at[:, 0, :12].set(pose_mats[:, :3, :].reshape(n, 12))
    proj16 = jnp.zeros((8, 16), jnp.float32)
    proj16 = proj16.at[0, :12].set(proj[:3, :].reshape(12))

    sub = SUB_BBOX if (0 < SUB_BBOX < tri_chunk
                       and tri_chunk % SUB_BBOX == 0) else tri_chunk
    n_sub = tri_chunk // sub
    kernel = functools.partial(
        _kernel, width=width, height=height, stride=stride,
        n_chunks=n_chunks, n_tiles=n_tiles, tri_chunk=tri_chunk,
        roi_w=roi_w, tile_pix=tile_pix, sub=sub, n_sub=n_sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # anchors, model_ids
        grid=(n,),
        in_specs=[
            # Each pose's model block, selected by the prefetched ids.
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
        scratch_shapes=[pltpu.VMEM((t, 16), jnp.float32),
                        pltpu.SMEM((4, max(8, n_chunks * n_sub)),
                                   jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, tile_pix), jnp.int32),
        interpret=interpret,
    )(anchors.astype(jnp.int32), model_ids.astype(jnp.int32),
      verts16, pose16, proj16)
    return out.reshape(n, n_tiles * tile_pix)[:, :npix]
