"""Monolithic Pallas ICP: the entire Gauss-Newton refinement per pose runs
inside one kernel invocation, all state in VMEM/registers.

The composed-ops version (ops/icp.py) pays per-iteration overhead for ~15
small XLA ops x 20-30 iterations x the batch (NN launch, gathers, einsums,
batched solve): ~3.5 ms/iteration for 512 poses on v5e even though the
arithmetic is ~1M ops/pose/iteration. Here one grid step = one pose's whole
refinement:

  * points live as [3, P] lane vectors; the cropped target set [S, 3] stays
    resident in VMEM;
  * nearest neighbours come from a [S, P] distance tile reduced over
    sublanes; the corresponding target point/normal is recovered with a
    one-hot masked sum (Mosaic has no cross-sublane gather) — exactly
    equivalent to the gather for unique minima, tie-broken by index;
  * the 21+6 normal-equation sums reduce [1, P] products to scalars; the
    6x6 Cholesky solve and the SE(3) exponential update run as unrolled
    scalar arithmetic;
  * fixed iteration count (converged poses take harmless ~zero steps —
    the damped system yields xi ~ 0).

Numerical semantics match ops/icp.py `_gn_step` with pp_weight=0 (the NN
association mode), minus the per-pose early exit.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Eval override: disable the per-pose early exit entirely.
_STAGNATION_STREAK = (1e9 if os.environ.get("PT_ICP_NO_EARLY_EXIT")
                      else 5.0)


def _icp_kernel(src_ref, sadd_ref, tgt_ref, nrm_ref, tadd_ref, out_ref, *,
                p, s, max_iterations, max_corr_sq, damping):
    """src [1,3,P]; sadd [1,1,P]; tgt/nrm [1,S,4]; tadd [1,S,1];
    out [1,8,128] (delta in [0:4,0:4])."""
    sx = src_ref[0, 0:1, :]
    sy = src_ref[0, 1:2, :]
    sz = src_ref[0, 2:3, :]
    sadd = sadd_ref[0, :, :]                       # [1, P]
    tx = tgt_ref[0, :, 0:1]                        # [S, 1]
    ty = tgt_ref[0, :, 1:2]
    tz = tgt_ref[0, :, 2:3]
    nx_t = nrm_ref[0, :, 0:1]
    ny_t = nrm_ref[0, :, 1:2]
    nz_t = nrm_ref[0, :, 2:3]
    tadd = tadd_ref[0, :, :]                       # [S, 1]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)

    def body(carry):
        # carry: iter k, current transform (12 scalars), best transform (12),
        # best rmse, stagnation streak.
        k, cur_tf, best_tf, best_rmse, streak = carry
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = cur_tf
        cx = r00 * sx + r01 * sy + r02 * sz + t0   # [1, P]
        cy = r10 * sx + r11 * sy + r12 * sz + t1
        cz = r20 * sx + r21 * sy + r22 * sz + t2

        dx = tx - cx                               # [S, P]
        dy = ty - cy
        dz = tz - cz
        d = dx * dx + dy * dy + dz * dz + tadd
        dmin = d.min(axis=0, keepdims=True)        # [1, P]
        # One-hot of the minimum (unique winner by smallest sublane index).
        is_min = d <= dmin
        first = jnp.where(is_min, sub_iota, jnp.int32(s)).min(
            axis=0, keepdims=True)
        onehot = (is_min & (sub_iota <= first)).astype(jnp.float32)

        qx = (onehot * tx).sum(axis=0, keepdims=True)   # [1, P]
        qy = (onehot * ty).sum(axis=0, keepdims=True)
        qz = (onehot * tz).sum(axis=0, keepdims=True)
        nx = (onehot * nx_t).sum(axis=0, keepdims=True)
        ny = (onehot * ny_t).sum(axis=0, keepdims=True)
        nz = (onehot * nz_t).sum(axis=0, keepdims=True)

        w = ((dmin + sadd) <= max_corr_sq).astype(jnp.float32)  # [1, P]

        ex = cx - qx
        ey = cy - qy
        ez = cz - qz
        e = nx * ex + ny * ey + nz * ez
        # Point-to-plane jacobian: (cur x n, n).
        j0 = cy * nz - cz * ny
        j1 = cz * nx - cx * nz
        j2 = cx * ny - cy * nx
        js = (j0, j1, j2, nx, ny, nz)

        h = [[None] * 6 for _ in range(6)]
        g = [None] * 6
        for i in range(6):
            for jj in range(i, 6):
                h[i][jj] = (js[i] * js[jj] * w).sum()
            g[i] = -(js[i] * e * w).sum()
        count = w.sum()
        ok = count >= 6.0
        # RMSE of the plane residual at the CURRENT transform: used to track
        # the best-so-far pose (GN on quantised depth oscillates; the last
        # iterate is not the best one).
        rmse = jnp.sqrt((e * e * w).sum() / jnp.maximum(count, 1.0))
        improved = ok & (rmse < best_rmse)
        new_best_rmse = jnp.where(improved, rmse, best_rmse)
        new_best_tf = tuple(
            jnp.where(improved, c, bv) for c, bv in zip(cur_tf, best_tf))

        trace = h[0][0] + h[1][1] + h[2][2] + h[3][3] + h[4][4] + h[5][5]
        lam = damping * trace / 6.0 + 1e-9
        for i in range(6):
            h[i][i] = h[i][i] + lam
        # Guard: identity system when under-determined -> xi = 0 (g scaled 0).
        okf = jnp.where(ok, 1.0, 0.0)
        for i in range(6):
            for jj in range(i, 6):
                base = 1.0 if i == jj else 0.0
                h[i][jj] = okf * h[i][jj] + (1.0 - okf) * base
            g[i] = okf * g[i]

        # Unrolled 6x6 Cholesky solve (scalars).
        l = [[None] * 6 for _ in range(6)]
        for jj in range(6):
            ssum = h[jj][jj]
            for kk in range(jj):
                ssum = ssum - l[jj][kk] * l[jj][kk]
            l[jj][jj] = jnp.sqrt(jnp.maximum(ssum, 1e-20))
            inv = 1.0 / l[jj][jj]
            for i in range(jj + 1, 6):
                ssum = h[jj][i]  # upper triangle holds the symmetric entry
                for kk in range(jj):
                    ssum = ssum - l[i][kk] * l[jj][kk]
                l[i][jj] = ssum * inv
        yv = [None] * 6
        for i in range(6):
            ssum = g[i]
            for kk in range(i):
                ssum = ssum - l[i][kk] * yv[kk]
            yv[i] = ssum / l[i][i]
        xi = [None] * 6
        for i in reversed(range(6)):
            ssum = yv[i]
            for kk in range(i + 1, 6):
                ssum = ssum - l[kk][i] * xi[kk]
            xi[i] = ssum / l[i][i]

        # SO(3) exp of omega = (xi0, xi1, xi2) via Rodrigues.
        wx, wy, wz = xi[0], xi[1], xi[2]
        theta2 = wx * wx + wy * wy + wz * wz
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
        st = jnp.sin(theta)
        ct = jnp.cos(theta)
        a = st / theta
        b = (1.0 - ct) / jnp.maximum(theta2, 1e-24)
        # Small-angle fallback.
        small = theta2 < 1e-12
        a = jnp.where(small, 1.0, a)
        b = jnp.where(small, 0.5, b)
        e00 = 1.0 - b * (wy * wy + wz * wz)
        e01 = -a * wz + b * wx * wy
        e02 = a * wy + b * wx * wz
        e10 = a * wz + b * wx * wy
        e11 = 1.0 - b * (wx * wx + wz * wz)
        e12 = -a * wx + b * wy * wz
        e20 = -a * wy + b * wx * wz
        e21 = a * wx + b * wy * wz
        e22 = 1.0 - b * (wx * wx + wy * wy)

        # Compose: R' = E R ; t' = E t + u.
        nr00 = e00 * r00 + e01 * r10 + e02 * r20
        nr01 = e00 * r01 + e01 * r11 + e02 * r21
        nr02 = e00 * r02 + e01 * r12 + e02 * r22
        nr10 = e10 * r00 + e11 * r10 + e12 * r20
        nr11 = e10 * r01 + e11 * r11 + e12 * r21
        nr12 = e10 * r02 + e11 * r12 + e12 * r22
        nr20 = e20 * r00 + e21 * r10 + e22 * r20
        nr21 = e20 * r01 + e21 * r11 + e22 * r21
        nr22 = e20 * r02 + e21 * r12 + e22 * r22
        nt0 = e00 * t0 + e01 * t1 + e02 * t2 + xi[3]
        nt1 = e10 * t0 + e11 * t1 + e12 * t2 + xi[4]
        nt2 = e20 * t0 + e21 * t1 + e22 * t2 + xi[5]
        new_cur = (nr00, nr01, nr02, nr10, nr11, nr12, nr20, nr21, nr22,
                   nt0, nt1, nt2)
        # Per-pose early exit: step-epsilon convergence, or no significant
        # best-rmse improvement for _STAGNATION_STREAK iterations. Measured
        # trade-off on 14 random-SO(3) synthetic scenes: ~2 ADD-S AUC for
        # ~1.4x pipeline speed (within small-sample noise); set
        # PT_ICP_NO_EARLY_EXIT=1 to run the full trip count.
        rot_n2 = wx * wx + wy * wy + wz * wz
        trn_n2 = xi[3] * xi[3] + xi[4] * xi[4] + xi[5] * xi[5]
        step_small = (rot_n2 < 4e-6) & (trn_n2 < 2.5e-7)
        improved_sig = rmse < best_rmse - 1e-6
        new_streak = jnp.where(improved_sig, jnp.float32(0.0), streak + 1.0)
        done = step_small | (new_streak >= _STAGNATION_STREAK) | (~ok)
        next_k = jnp.where(done, jnp.int32(max_iterations), k + 1)
        return (next_k, new_cur, new_best_tf, new_best_rmse, new_streak)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ident = (one, zero, zero, zero, one, zero, zero, zero, one,
             zero, zero, zero)
    init = (jnp.int32(0), ident, ident, jnp.float32(np.inf),
            jnp.float32(0.0))
    final_carry = jax.lax.while_loop(
        lambda c: c[0] < max_iterations, body, init)
    final = final_carry[2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    vals = list(final)
    for i in range(3):
        for jj in range(3):
            out = jnp.where((rows == i) & (cols == jj), vals[3 * i + jj], out)
        out = jnp.where((rows == i) & (cols == 3), vals[9 + i], out)
    out = jnp.where((rows == 3) & (cols == 3), 1.0, out)
    out_ref[0, :, :] = out


@functools.partial(jax.jit, static_argnames=(
    "max_iterations", "max_correspondence", "damping", "interpret"))
def icp_fused_pallas(
    src_xyz: jax.Array,      # [N, P, 3]
    src_valid: jax.Array,    # [N, P]
    tgt_xyz: jax.Array,      # [N, S, 3] (pre-cropped per pose)
    tgt_valid: jax.Array,    # [N, S]
    tgt_normals: jax.Array,  # [N, S, 3]
    *,
    max_iterations: int = 20,
    max_correspondence: float = 0.05,
    damping: float = 1e-4,
    interpret: bool = False,
) -> jax.Array:
    """Camera-frame corrections [N, 4, 4] (pose' = delta @ pose)."""
    n, p, _ = src_xyz.shape
    s = tgt_xyz.shape[1]
    # Pad P to lanes, S to sublanes.
    p_pad = ((p + 127) // 128) * 128
    s_pad = ((s + 7) // 8) * 8

    src_t = jnp.transpose(src_xyz, (0, 2, 1))
    if p_pad != p:
        src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, p_pad - p)))
    sadd = jnp.where(src_valid, 0.0, jnp.inf).astype(jnp.float32)[:, None, :]
    if p_pad != p:
        sadd = jnp.pad(sadd, ((0, 0), (0, 0), (0, p_pad - p)),
                       constant_values=jnp.inf)

    def pad_s(x, fill=0.0):
        if s_pad == s:
            return x
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)),
                       constant_values=fill)

    tgt4 = pad_s(jnp.pad(tgt_xyz, ((0, 0), (0, 0), (0, 1))))
    nrm4 = pad_s(jnp.pad(tgt_normals, ((0, 0), (0, 0), (0, 1))))
    tadd = pad_s(
        jnp.where(tgt_valid, 0.0, jnp.inf).astype(jnp.float32)[..., None],
        fill=jnp.inf)

    kernel = functools.partial(
        _icp_kernel, p=p_pad, s=s_pad, max_iterations=max_iterations,
        max_corr_sq=max_correspondence * max_correspondence, damping=damping)
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
            pl.BlockSpec((1, s_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(src_t, sadd, tgt4, nrm4, tadd)
    return out[:, :4, :4]
