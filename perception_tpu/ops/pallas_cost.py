"""Fused 1-NN + cost-count Pallas kernel.

For the depth-only cost types (0 / 2 — the flagship 6-DoF path), the cost
stage needs only three per-pose scalars: rendered point count, unexplained
count, and the number of *distinct* observed points explained
(compute_costs.cuh:161-290). The composed path materialises [N, P]
distances + indices in HBM and scatters an [N, S] explained matrix; here
everything reduces in VMEM in two passes over the target tiles:

  pass 1: running min distance per rendered point;
  pass 2: one-hot winner recovery (first tile, first sublane — matching the
          deterministic argmin of ops/pallas_knn) -> per-observed-row "was
          explained" max -> scalar count.

The RGB cost types (1 / 3) fuse the CIEDE2000 colour gate
(compute_costs.cuh:207-248) into pass 2: the winner's Lab colour is
recovered from the one-hot claim by a bf16 MXU matmul (hi/lo split, the
same exact-recovery trick as pallas_icp's plane recovery), the colour
distance runs on [1, P] lane vectors, and a rendered point explains its
observed winner only if BOTH the distance and the colour gate pass; a
close-but-wrong-colour point counts unexplained, exactly as the composed
path and the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 256


def _cost_kernel(cloud_ref, cadd_ref, tgt_ref, tadd_ref, out_ref, *,
                 p, s, r_tile, max_dist_sq):
    cx = cloud_ref[0, 0:1, :]
    cy = cloud_ref[0, 1:2, :]
    cz = cloud_ref[0, 2:3, :]
    cadd = cadd_ref[0, :, :]                       # [1, P]; inf = invalid
    n_tiles = s // r_tile

    def dist_tile(ri):
        tx = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 0:1]
        ty = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 1:2]
        tz = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 2:3]
        tadd = tadd_ref[0, pl.ds(ri * r_tile, r_tile), :]
        dx = tx - cx
        dy = ty - cy
        dz = tz - cz
        return dx * dx + dy * dy + dz * dz + tadd  # [Rt, P]

    def pass1(ri, dmin):
        return jnp.minimum(dmin, dist_tile(ri).min(axis=0, keepdims=True))

    dmin = jax.lax.fori_loop(
        0, n_tiles, pass1, jnp.full((1, p), jnp.inf, dtype=jnp.float32))

    # cadd is a 3-state flag row: 0 = real rendered point, -1 = explain-only
    # augmentation (fills observed-coverage holes in cost_cloud="transform"
    # mode; never counts toward point_num / rendered cost), inf = invalid.
    valid = cadd == 0.0                             # [1, P]
    explainer = cadd <= 0.0
    close = (dmin <= max_dist_sq) & explainer
    point_num = valid.astype(jnp.float32).sum()
    unexplained = (valid & (dmin > max_dist_sq)).astype(jnp.float32).sum()

    iota = jax.lax.broadcasted_iota(jnp.int32, (r_tile, p), 0)

    def pass2(ri, carry):
        explained_count, claimed = carry            # claimed: f32 0/1 [1, P]
        d = dist_tile(ri)
        is_min = (d <= dmin) & (claimed == 0.0)     # [Rt, P]
        first = jnp.where(is_min, iota, jnp.int32(r_tile)).min(
            axis=0, keepdims=True)
        onehot = is_min & (iota <= first) & close
        explained_rows = onehot.astype(jnp.float32).max(
            axis=1, keepdims=True)                  # [Rt, 1]
        explained_count = explained_count + explained_rows.sum()
        claimed = jnp.maximum(
            claimed, is_min.astype(jnp.float32).max(axis=0, keepdims=True))
        return explained_count, claimed

    explained, _ = jax.lax.fori_loop(
        0, n_tiles, pass2,
        (jnp.float32(0.0), jnp.zeros((1, p), dtype=jnp.float32)))

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    out = jnp.where((rows == 0) & (cols == 0), point_num, out)
    out = jnp.where((rows == 0) & (cols == 1), unexplained, out)
    out = jnp.where((rows == 0) & (cols == 2), explained, out)
    out_ref[0, :, :] = out


def _cost_kernel_color(*refs, p, s, r_tile, max_dist_sq, color_thresh,
                       tri_mode, t=0):
    from perception_tpu.ops.color import ciede2000_components

    if tri_mode:
        # (mids_prefetch, cloud8, tgt16, bank_lab, out): rendered Lab is
        # recovered IN-KERNEL from the face-colour table by a one-hot dot
        # against the tri-id row — the XLA per-pose colour gathers this
        # replaces (render colour take_along_axis + bank select) measured
        # ~27 ms/2048-pose batch, ~3x the kernel itself.
        _mids_ref, cloud8_ref, tgt16_ref, bank_ref, out_ref = refs
    else:
        cloud8_ref, tgt16_ref, out_ref = refs
    cx = cloud8_ref[0, 0:1, :]
    cy = cloud8_ref[0, 1:2, :]
    cz = cloud8_ref[0, 2:3, :]
    cadd = cloud8_ref[0, 3:4, :]                   # [1, P]; inf = invalid
    if tri_mode:
        tid = cloud8_ref[0, 4:5, :]                # [1, P] float tri id
        tio = jax.lax.broadcasted_iota(jnp.int32, (t, p), 0).astype(
            jnp.float32)                       # (Mosaic has no float iota)
        oh_tri = (tio == tid).astype(jnp.bfloat16)           # [T, P]
        clabs = jax.lax.dot_general(
            bank_ref[0, 0:6, :].astype(jnp.bfloat16), oh_tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [6, P]
        cl = clabs[0:1] + clabs[3:4]
        ca = clabs[1:2] + clabs[4:5]
        cb = clabs[2:3] + clabs[5:6]
    else:
        cl = cloud8_ref[0, 4:5, :]                 # rendered Lab [1, P] x3
        ca = cloud8_ref[0, 5:6, :]
        cb = cloud8_ref[0, 6:7, :]
    n_tiles = s // r_tile

    def dist_tile(ri):
        tx = tgt16_ref[0, pl.ds(ri * r_tile, r_tile), 0:1]
        ty = tgt16_ref[0, pl.ds(ri * r_tile, r_tile), 1:2]
        tz = tgt16_ref[0, pl.ds(ri * r_tile, r_tile), 2:3]
        tadd = tgt16_ref[0, pl.ds(ri * r_tile, r_tile), 3:4]
        dx = tx - cx
        dy = ty - cy
        dz = tz - cz
        return dx * dx + dy * dy + dz * dz + tadd  # [Rt, P]

    def pass1(ri, dmin):
        return jnp.minimum(dmin, dist_tile(ri).min(axis=0, keepdims=True))

    dmin = jax.lax.fori_loop(
        0, n_tiles, pass1, jnp.full((1, p), jnp.inf, dtype=jnp.float32))

    valid = cadd == 0.0                             # [1, P]
    # 3-state flag (see _cost_kernel): -1 marks explain-only augmentation
    # points; they may claim observed rows but never count in point_num /
    # unexplained, and (carrying no rendered colour) bypass the gate.
    explainer = cadd <= 0.0
    is_aug = cadd == -1.0
    close = (dmin <= max_dist_sq) & explainer
    point_num = valid.astype(jnp.float32).sum()
    far_count = (valid & (dmin > max_dist_sq)).astype(jnp.float32).sum()

    iota = jax.lax.broadcasted_iota(jnp.int32, (r_tile, p), 0)

    def pass2(ri, carry):
        explained_count, claimed, color_bad = carry
        d = dist_tile(ri)
        is_min = (d <= dmin) & (claimed == 0.0)     # [Rt, P]
        first = jnp.where(is_min, iota, jnp.int32(r_tile)).min(
            axis=0, keepdims=True)
        onehot = is_min & (iota <= first)           # deterministic claim
        # Winner Lab recovery: [Rt, 6] bf16 hi/lo columns contracted with
        # the one-hot claim on axis 0 (single-term sums -> exact to ~2^-16,
        # see module docstring); sublane-major input means NO host-side
        # component transpose.
        lab_sub = tgt16_ref[0, pl.ds(ri * r_tile, r_tile), 4:10].astype(
            jnp.bfloat16)                           # [Rt, 6]
        labs = jax.lax.dot_general(
            lab_sub, onehot.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [6, P]
        tl = labs[0:1] + labs[3:4]
        ta = labs[1:2] + labs[4:5]
        tb = labs[2:3] + labs[5:6]
        claimed_here = onehot.astype(jnp.float32).max(axis=0, keepdims=True)
        de = ciede2000_components(tl, ta, tb, cl, ca, cb,
                                  kernel_safe=True)    # [1, P]
        ok = (de <= color_thresh) | is_aug
        gated = onehot & close & ok
        explained_rows = gated.astype(jnp.float32).max(
            axis=1, keepdims=True)                  # [Rt, 1]
        explained_count = explained_count + explained_rows.sum()
        color_bad = jnp.maximum(
            color_bad, claimed_here * (close & ~ok).astype(jnp.float32))
        claimed = jnp.maximum(
            claimed, is_min.astype(jnp.float32).max(axis=0, keepdims=True))
        return explained_count, claimed, color_bad

    explained, _, color_bad = jax.lax.fori_loop(
        0, n_tiles, pass2,
        (jnp.float32(0.0), jnp.zeros((1, p), dtype=jnp.float32),
         jnp.zeros((1, p), dtype=jnp.float32)))
    unexplained = far_count + color_bad.sum()

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    out = jnp.where((rows == 0) & (cols == 0), point_num, out)
    out = jnp.where((rows == 0) & (cols == 1), unexplained, out)
    out = jnp.where((rows == 0) & (cols == 2), explained, out)
    out_ref[0, :, :] = out


def _cadd_flags(cloud_valid, cloud_explain_only):
    """3-state flag row: 0 real, -1 explain-only augmentation, inf invalid."""
    cadd = jnp.where(cloud_valid, 0.0, jnp.inf).astype(jnp.float32)
    if cloud_explain_only is not None:
        cadd = jnp.where(cloud_valid & cloud_explain_only, -1.0, cadd)
    return cadd


@functools.partial(jax.jit, static_argnames=("sensor_resolution", "interpret"))
def nn_cost_fused_pallas(
    cloud_xyz: jax.Array,   # [N, P, 3]
    cloud_valid: jax.Array, # [N, P]
    tgt_xyz: jax.Array,     # [N, S, 3]
    tgt_valid: jax.Array,   # [N, S]
    sensor_resolution: float,
    interpret: bool = False,
    cloud_explain_only: jax.Array | None = None,  # [N, P] aug-point mask
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(point_num [N], unexplained [N], observed_explained [N]) float32."""
    n, p, _ = cloud_xyz.shape
    s = tgt_xyz.shape[1]
    p_pad = ((p + 127) // 128) * 128
    r_tile = min(R_TILE, s)
    s_pad = ((s + r_tile - 1) // r_tile) * r_tile

    cloud_t = jnp.transpose(cloud_xyz, (0, 2, 1))
    cadd = _cadd_flags(cloud_valid, cloud_explain_only)[:, None, :]
    if p_pad != p:
        cloud_t = jnp.pad(cloud_t, ((0, 0), (0, 0), (0, p_pad - p)))
        cadd = jnp.pad(cadd, ((0, 0), (0, 0), (0, p_pad - p)),
                       constant_values=jnp.inf)
    tgt4 = jnp.pad(tgt_xyz, ((0, 0), (0, s_pad - s), (0, 1)))
    tadd = jnp.pad(
        jnp.where(tgt_valid, 0.0, jnp.inf).astype(jnp.float32)[..., None],
        ((0, 0), (0, s_pad - s), (0, 0)), constant_values=jnp.inf)

    kernel = functools.partial(
        _cost_kernel, p=p_pad, s=s_pad, r_tile=r_tile,
        max_dist_sq=sensor_resolution * sensor_resolution)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(cloud_t, cadd, tgt4, tadd)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


@functools.partial(jax.jit, static_argnames=(
    "sensor_resolution", "color_distance_threshold", "interpret"))
def nn_cost_fused_color_pallas(
    cloud_xyz: jax.Array,   # [N, P, 3]
    cloud_valid: jax.Array, # [N, P]
    cloud_lab: jax.Array,   # [N, P, 3] CIELAB (pre-converted Lab bank)
    tgt_xyz: jax.Array,     # [N, S, 3]
    tgt_valid: jax.Array,   # [N, S]
    tgt_lab: jax.Array,     # [N, S, 3] CIELAB
    sensor_resolution: float,
    color_distance_threshold: float,
    interpret: bool = False,
    cloud_explain_only: jax.Array | None = None,  # [N, P] aug-point mask
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Colour-gated fused cost (types 1/3):
    (point_num [N], unexplained [N], observed_explained [N]) float32.

    Input packing is chosen so the colour path adds NO awkward relayouts
    over the depth path: ONE [N, P, 8] -> [N, 8, P] cloud transpose
    (replacing the depth path's xyz+validity pair) and a minor-dim concat
    for the [N, S, 16] sublane-major target pack — an earlier
    component-major [N, 8, S] target layout cost three extra minor-dim-3
    transposes that measured ~2x the whole kernel."""
    n, p, _ = cloud_xyz.shape
    s = tgt_xyz.shape[1]
    p_pad = ((p + 127) // 128) * 128
    r_tile = min(R_TILE, s)
    s_pad = ((s + r_tile - 1) // r_tile) * r_tile

    cadd = _cadd_flags(cloud_valid, cloud_explain_only)
    cloud_pack = jnp.concatenate(
        [cloud_xyz, cadd[..., None], cloud_lab,
         jnp.zeros((n, p, 1), jnp.float32)], axis=-1)     # [N, P, 8]
    cloud8 = jnp.transpose(cloud_pack, (0, 2, 1))         # [N, 8, P]
    if p_pad != p:
        pad_col = jnp.zeros((n, 8, p_pad - p), jnp.float32)
        pad_col = pad_col.at[:, 3, :].set(jnp.inf)
        cloud8 = jnp.concatenate([cloud8, pad_col], axis=2)

    tadd = jnp.where(tgt_valid, 0.0, jnp.inf).astype(jnp.float32)
    # reduce_precision, NOT astype(bf16).astype(f32): XLA's
    # excess-precision elision folds the convert round-trip away, which
    # zeroes the lo correction at trace time (caught on-chip round 5 in
    # gather_rows_onehot; same pattern here).
    hi = jax.lax.reduce_precision(tgt_lab, 8, 7)
    lo = tgt_lab - hi
    tgt16 = jnp.concatenate(
        [tgt_xyz, tadd[..., None], hi, lo,
         jnp.zeros((n, s, 6), jnp.float32)], axis=-1)     # [N, S, 16]
    if s_pad != s:
        pad_row = jnp.zeros((n, s_pad - s, 16), jnp.float32)
        pad_row = pad_row.at[:, :, 3].set(jnp.inf)
        tgt16 = jnp.concatenate([tgt16, pad_row], axis=1)

    kernel = functools.partial(
        _cost_kernel_color, p=p_pad, s=s_pad, r_tile=r_tile,
        max_dist_sq=sensor_resolution * sensor_resolution,
        color_thresh=color_distance_threshold, tri_mode=False)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 8, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(cloud8, tgt16)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


def pack_bank_lab(bank_lab: jax.Array) -> jax.Array:
    """[M, T, 3] face Lab -> [M, 8, T] component-major bf16-hi/lo rows
    for the in-kernel recovery (static, once per bank)."""
    m, t, _ = bank_lab.shape
    lab_t = jnp.transpose(bank_lab.astype(jnp.float32), (0, 2, 1))  # [M,3,T]
    # reduce_precision: see the elision note in nn_cost_fused_color_pallas.
    hi = jax.lax.reduce_precision(lab_t, 8, 7)
    lo = lab_t - hi
    return jnp.concatenate(
        [hi, lo, jnp.zeros((m, 2, t), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=(
    "sensor_resolution", "color_distance_threshold", "interpret"))
def nn_cost_fused_color_tri_pallas(
    cloud_xyz: jax.Array,   # [N, P, 3]
    cloud_valid: jax.Array, # [N, P]
    cloud_tri_id: jax.Array,  # [N, P] int32 winning face id (-1 = none)
    model_ids: jax.Array,   # [N] int32
    bank_lab8: jax.Array,   # [M, 8, T] from pack_bank_lab
    tgt_xyz: jax.Array,     # [N, S, 3]
    tgt_valid: jax.Array,   # [N, S]
    tgt_lab: jax.Array,     # [N, S, 3] CIELAB
    sensor_resolution: float,
    color_distance_threshold: float,
    interpret: bool = False,
    cloud_explain_only: jax.Array | None = None,  # [N, P] aug-point mask
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Colour-gated fused cost with IN-KERNEL rendered-colour recovery:
    the winning face id (free from the raster's packed keys) plus the
    static per-model Lab table replace the [N, P, 3] colour gathers.
    Requires point index == pixel index (ROI mode's compaction-free
    clouds)."""
    n, p, _ = cloud_xyz.shape
    s = tgt_xyz.shape[1]
    t = bank_lab8.shape[2]
    p_pad = ((p + 127) // 128) * 128
    r_tile = min(R_TILE, s)
    s_pad = ((s + r_tile - 1) // r_tile) * r_tile

    cadd = _cadd_flags(cloud_valid, cloud_explain_only)
    tidf = jnp.where(cloud_valid, cloud_tri_id, -1).astype(jnp.float32)
    if cloud_explain_only is not None:
        tidf = jnp.where(cloud_explain_only, -1.0, tidf)
    cloud_pack = jnp.concatenate(
        [cloud_xyz, cadd[..., None], tidf[..., None],
         jnp.zeros((n, p, 3), jnp.float32)], axis=-1)     # [N, P, 8]
    cloud8 = jnp.transpose(cloud_pack, (0, 2, 1))         # [N, 8, P]
    if p_pad != p:
        pad_col = jnp.zeros((n, 8, p_pad - p), jnp.float32)
        pad_col = pad_col.at[:, 3, :].set(jnp.inf)
        pad_col = pad_col.at[:, 4, :].set(-1.0)
        cloud8 = jnp.concatenate([cloud8, pad_col], axis=2)

    tadd = jnp.where(tgt_valid, 0.0, jnp.inf).astype(jnp.float32)
    # reduce_precision, NOT astype(bf16).astype(f32): XLA's
    # excess-precision elision folds the convert round-trip away, which
    # zeroes the lo correction at trace time (caught on-chip round 5 in
    # gather_rows_onehot; same pattern here).
    hi = jax.lax.reduce_precision(tgt_lab, 8, 7)
    lo = tgt_lab - hi
    tgt16 = jnp.concatenate(
        [tgt_xyz, tadd[..., None], hi, lo,
         jnp.zeros((n, s, 6), jnp.float32)], axis=-1)     # [N, S, 16]
    if s_pad != s:
        pad_row = jnp.zeros((n, s_pad - s, 16), jnp.float32)
        pad_row = pad_row.at[:, :, 3].set(jnp.inf)
        tgt16 = jnp.concatenate([tgt16, pad_row], axis=1)

    kernel = functools.partial(
        _cost_kernel_color, p=p_pad, s=s_pad, r_tile=r_tile,
        max_dist_sq=sensor_resolution * sensor_resolution,
        color_thresh=color_distance_threshold, tri_mode=True, t=t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # model ids
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 8, p_pad), lambda i, mid_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 16), lambda i, mid_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, t), lambda i, mid_ref: (mid_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, mid_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(model_ids.astype(jnp.int32), cloud8, tgt16, bank_lab8)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]
