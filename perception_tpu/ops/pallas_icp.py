"""Monolithic Pallas ICP: the entire Gauss-Newton refinement per pose runs
inside one kernel invocation, all state in VMEM/registers.

The composed-ops version (ops/icp.py) pays per-iteration overhead for ~15
small XLA ops x 20-30 iterations x the batch (NN launch, gathers, einsums,
batched solve): ~3.5 ms/iteration for 512 poses on v5e even though the
arithmetic is ~1M ops/pose/iteration. Here one grid step = one small
group (_GROUP) of poses' whole refinement:

  * points live as [3, P] lane vectors; the cropped target set [S, 3] stays
    resident in VMEM;
  * nearest neighbours come from a per-pose [S, P] distance tile reduced
    over sublanes, computed in expanded |t|^2 - 2 t.c + |c|^2 form against
    loop-invariant target columns (3 FMA + 2 add per entry); the matching
    target plane (n, n.t) is recovered from the one-hot argmin by a single
    [8, S] @ [S, P] bf16 MXU matmul (Mosaic has no cross-sublane gather;
    one-hot operand means single-term sums, and hi/lo bf16 attribute
    splitting keeps the recovery exact to ~2^-16; the point-to-plane
    residual e = n.c - n.q only needs n and n.t, so q is never
    materialised) — equivalent to the gather for unique minima,
    tie-broken by index;
  * everything after the per-pose NN is vectorised ACROSS THE GROUP: the
    21+6 normal-equation sums are [8, P] row reductions to [8, 1], and the
    unrolled 6x6 Cholesky solve, Rodrigues SE(3) exponential and compose
    run on [8, 1] sublane vectors. (A scalar-per-pose variant measured the
    serialized ~400-op solve chain at HALF the kernel time: 15.4 vs 7.6
    ms/512 poses at 20 iterations with the solve stubbed out.)
  * per-pose early exit with freeze masks: a converged pose's transform,
    best-so-far state and streak are frozen, so results are identical to
    the one-pose-per-step kernel; the group exits when all members are done.
    Measured on v5e at 512 poses / 20 iters: 15.4 -> 10.9 ms fixed-trip,
    12.1 -> 10.0 ms with early exit (grouping trades some exit granularity
    for the vectorised solve). At the round-5 bench shapes (2048 poses,
    S=256, nn_every=2) G=8 beats G=4 by 19% kernel time (13.4 vs 16.5
    ms/batch, benchmarks/icp_micro.py) and +5.7% whole-pipeline (64.9k vs
    61.4k poses/s) — the solve chain is paid once per grid step, so larger
    groups amortise it; G=16 exceeds scoped VMEM. Because the freeze
    masks make results identical across G (test_perf_kernels.py
    test_fused_icp_group_size_is_pure_scheduling), G is a pure perf knob
    and ships at 8.

Numerical semantics match ops/icp.py `_gn_step` with pp_weight=0 (the NN
association mode): best-so-far (min plane RMSE) transform tracking, LM-style
trace-scaled damping, no step clamping.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Stagnation-streak early exit default. Measured on the paired 150-scene
# zoo harness: streak=5 costs a SIGNIFICANT -1.56 [-2.69, -0.46] ADD-S AUC
# vs no stagnation exit, for +13% pipeline speed — the default stays
# accuracy-first at 8 (see config.py icp_stagnation_streak). The env
# overrides (PT_ICP_NO_EARLY_EXIT / PT_ICP_STREAK) are resolved host-side
# in pipeline/env.py _resolve_streak_env — the explicit argument here is
# authoritative; reading os.environ inside the jitted body would capture
# a stale value on cached retraces.
_GROUP = int(os.environ.get("PT_ICP_GROUP", 8))


def _icp_kernel(src_ref, sadd_ref, tgt_ref, out_ref, *,
                g, p, s, max_iterations, max_corr_sq, damping, nn_every=1,
                rot_eps_sq=4e-6, trn_eps_sq=2.5e-7,
                stagnation_streak=8.0, d2d_epsilon=0.0, sym=False,
                exact=False, assoc_trigger=0.0):
    """src [G,3,P] (or [G,6,P] with per-point source normals when sym);
    sadd [G,1,P]; tgt [G,S,8] packed
    (x, y, z, nx, ny, nz, n.t, validity-additive);
    out [G,8,128] (pose gi's delta in out[gi, 0:4, 0:4]).

    d2d_epsilon > 0 switches the cost from point-to-plane to the GICP
    distribution weighting with a plane-regularised TARGET covariance
    C_t = I - (1 - eps) n n^T (fast_gicp's D2D with the source treated
    isotropic, renderer.cu:1693-1720): W = C_t^-1 decomposes exactly into
    plane weight 1/eps + tangential weight 1, i.e. cost ~ (n.r)^2 +
    eps_w |r|^2 with eps_w = eps / (1 - eps) after normalising the plane
    weight to 1. The point-to-point half has closed-form normal
    equations (H += J_a^T J_a over the three axes, g += (c x r, r)), so
    the only extra per-point machinery is recovering the matched target
    q through three more attribute rows in the one-hot MXU recovery.

    sym=True adds the SOURCE covariance's plane term (full GICP uses
    C_t + R C_s R^T; with both plane-regularised and the cross terms
    dropped the cost gains a second plane residual (R n_s).r with the
    source normal rotated by the current estimate, and the tangential
    weight doubles to keep the normal/tangential ratio at 1/eps —
    symmetric point-to-plane with a point-to-point floor). The source
    normals ride three extra src rows and rotate with R each iteration;
    their sign never matters (quadratic).

    exact=True (requires d2d + source normals) drops BOTH
    approximations and runs icp_gicp_batch's Mahalanobis GN verbatim:
    per-point weight W = inv(2 I - (1-eps)(nt nt^T + ns' ns'^T)) by
    closed-form adjugate (all elementwise on [G, P] lanes), H = J^T W J
    with J = [-[a]x | I] about the correspondence centroid,
    g = -J^T W r, Marquardt diagonal damping, Mahalanobis best-rmse.
    This is the full 3x3 covariance coupling (including the nt/ns cross
    terms the split modes drop) inside the fused kernel — the
    formulation that carries the +2 AUC noise edge on the slow path.
    The measured accuracy story (why this exists, thresholds, the
    covariance floor) lives in ops/icp.py icp_gicp_batch and
    ARCHITECTURE.md's GICP section."""
    sx = src_ref[:, 0, :]                          # [G, P]
    sy = src_ref[:, 1, :]
    sz = src_ref[:, 2, :]
    if sym:
        snx = src_ref[:, 3, :]                     # [G, P] source normals
        sny = src_ref[:, 4, :]
        snz = src_ref[:, 5, :]
    sadd = sadd_ref[:, 0, :]                       # [G, P]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)
    idx_mask = (1 << max(1, (s - 1)).bit_length()) - 1   # low bits for index

    # Loop-invariant per-target association tables (see associate()):
    #   d(s, p) = |t_s|^2 - 2 t_s . c_p + |c_p|^2
    # so the [S, P] sweep needs only 3 FMAs + 2 adds per entry against the
    # precomputed (-2 t, |t|^2 + validity-additive) columns, and the plane
    # attributes (nx, ny, nz, n.t) are recovered from the one-hot argmin by
    # ONE bf16 MXU matmul instead of four masked [S, P] sums. bf16 keeps
    # the recovery EXACT to ~2^-16: the one-hot operand is exactly 0/1, so
    # every output is a single product (no accumulation), and each
    # attribute is split into bf16 hi + lo parts recombined after the dot.
    d2d = d2d_epsilon > 0.0
    sym = bool(sym) and d2d
    exact = bool(exact) and d2d and sym   # needs q + source normals
    # Tangential (point-to-point) weight after normalising the plane
    # weight to 1 (see the docstring): eps / (1 - eps); doubled in
    # symmetric mode so the normal/tangential ratio stays 1/eps with two
    # unit-weight plane terms.
    wpp = d2d_epsilon / (1.0 - d2d_epsilon) if d2d else 0.0
    if sym:
        wpp = 2.0 * wpp
    # Attribute columns recovered from the one-hot argmin: the plane
    # (nx, ny, nz, n.t) always; the matched point (x, y, z) too in d2d
    # mode (the 3-vector residual needs q).
    attr_cols = (3, 4, 5, 6, 0, 1, 2) if d2d else (3, 4, 5, 6)
    n_attr = len(attr_cols)
    tassoc = []    # per member: (t2x, t2y, t2z, ttadd) [S, 1] columns
    attrs = []     # per member: [2 * n_attr, S] bf16 rows (hi..., lo...)
    for gi in range(g):
        tx = tgt_ref[gi, :, 0:1]
        ty = tgt_ref[gi, :, 1:2]
        tz = tgt_ref[gi, :, 2:3]
        tadd = tgt_ref[gi, :, 7:8]
        ttadd = tx * tx + ty * ty + tz * tz + tadd
        tassoc.append((-2.0 * tx, -2.0 * ty, -2.0 * tz, ttadd))
        rows_hi, rows_lo = [], []
        for col in attr_cols:
            a = tgt_ref[gi, :, col:col + 1].T          # [1, S]
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rows_hi.append(hi)
            rows_lo.append(lo)
        attrs.append(jnp.concatenate(rows_hi + rows_lo, axis=0))

    def body(carry):
        # carry: iter k (scalar), current/best transforms (12 x [G,1]),
        # best rmse, stagnation streak, done flag (f32 0/1) — all [G,1] —
        # the cached association (nx, ny, nz, nq, dmin) — [G, P] — and
        # accum, the per-pose upper bound on point motion since the last
        # association (adaptive mode only; carried as zeros otherwise).
        k, cur_tf, best_tf, best_rmse, streak, done, assoc, accum = carry
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = cur_tf
        cx = r00 * sx + r01 * sy + r02 * sz + t0   # [G, P]
        cy = r10 * sx + r11 * sy + r12 * sz + t1
        cz = r20 * sx + r21 * sy + r22 * sz + t2

        def associate(_):
            # Per-pose NN: target sets differ per pose, so the [S, P]
            # distance tile and the plane recovery run per group member.
            rows = [[] for _ in range(n_attr + 1)]   # attrs..., dmin
            for gi in range(g):
                t2x, t2y, t2z, ttadd = tassoc[gi]      # [S, 1]
                cgx = cx[gi:gi + 1, :]                 # [1, P]
                cgy = cy[gi:gi + 1, :]
                cgz = cz[gi:gi + 1, :]
                cc = cgx * cgx + cgy * cgy + cgz * cgz
                # Expanded squared distance (clamped: the three-term form
                # can go epsilon-negative under cancellation, which would
                # flip the bitcast ordering).
                d = ttadd + t2x * cgx + t2y * cgy + t2z * cgz    # [S, P]
                d = jnp.maximum(d + cc, 0.0)
                # Packed (distance, sublane-index) min: d >= 0 so its f32
                # bits are order-preserving as int32; the low index bits
                # both break ties toward the smallest sublane (as the
                # reference gather would) and let a single min produce the
                # winner id. Clearing the low bits quantises d by ~2^-15
                # relative — harmless for the correspondence threshold.
                db = jax.lax.bitcast_convert_type(d, jnp.int32)
                packed = (db & ~jnp.int32(idx_mask)) | sub_iota
                pmin = packed.min(axis=0, keepdims=True)   # [1, P]
                onehot = (sub_iota == (pmin & idx_mask)).astype(jnp.bfloat16)
                dmin = jax.lax.bitcast_convert_type(
                    pmin & ~jnp.int32(idx_mask), jnp.float32)

                # [2*n_attr, S] @ [S, P] on the MXU (see the precompute
                # comment); hi + lo parts recombine to the exact f32.
                planes = jax.lax.dot_general(
                    attrs[gi], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [2*n_attr, P]
                for ai in range(n_attr):
                    rows[ai].append(planes[ai:ai + 1]
                                    + planes[n_attr + ai:n_attr + ai + 1])
                rows[n_attr].append(dmin)

            return tuple(jnp.concatenate(r, axis=0)      # [G, P] each
                         for r in rows)

        if nn_every == 0:
            # Adaptive association: re-run the [S, P] sweep only when some
            # active pose may have MOVED far enough since its last
            # association to change correspondences. `accum` upper-bounds
            # per-pose point motion (sum over steps of theta * extent +
            # |u|, triangle inequality); the whole group associates when
            # any active member exceeds the trigger (association is
            # group-wide anyway). Early iterations take large steps and
            # get nn_every=1 fidelity; near convergence steps shrink below
            # the trigger and the sweep amortises further than a fixed
            # period would dare. trigger=0 degenerates to nn_every=1.
            need = (k == 0) | (jnp.max(accum * (1.0 - done))
                               > assoc_trigger)
            assoc = jax.lax.cond(need, associate, lambda _: assoc, 0)
            accum = jnp.where(need, jnp.zeros_like(accum), accum)
        elif nn_every > 1:
            # Re-associate every nn_every-th iteration; in between, take a
            # further GN step against the cached correspondences (classic
            # coarse ICP trick — point-to-plane is nearly linear per
            # association, so this trades some refinement quality for
            # halved [S, P] sweeps).
            assoc = jax.lax.cond(k % nn_every == 0, associate,
                                 lambda _: assoc, 0)
        else:
            assoc = associate(0)
        nx, ny, nz, nq = assoc[0], assoc[1], assoc[2], assoc[3]
        dmin_all = assoc[n_attr]

        w = ((dmin_all + sadd) <= max_corr_sq).astype(jnp.float32)  # [G, P]

        count = w.sum(axis=1, keepdims=True)
        if d2d:
            # Rotate about the per-pose correspondence centroid, not the
            # camera origin: at ~0.6 m range the origin lever arm couples
            # rotation and translation with a (range/extent)^2
            # conditioning penalty that stacks with the D2D anisotropy
            # (same fix as icp_gicp_batch; measured on the curved-patch
            # probe: the origin-centred solve stalls at 41 mm on a
            # 0.25 rad perturbation the centred solve recovers exactly).
            inv_cnt = 1.0 / jnp.maximum(count, 1.0)
            cenx = (cx * w).sum(axis=1, keepdims=True) * inv_cnt  # [G, 1]
            ceny = (cy * w).sum(axis=1, keepdims=True) * inv_cnt
            cenz = (cz * w).sum(axis=1, keepdims=True) * inv_cnt
            ax, ay, az = cx - cenx, cy - ceny, cz - cenz
        else:
            ax, ay, az = cx, cy, cz
        if exact:
            # Full-covariance GICP GN (icp_gicp_batch semantics; module
            # docstring "exact=True"). W is built and inverted per point
            # with elementwise lane math; the validity weight is folded
            # into M = w * W so every sum below is already masked.
            qx, qy, qz = assoc[4], assoc[5], assoc[6]
            rx, ry, rz = cx - qx, cy - qy, cz - qz
            nsx = r00 * snx + r01 * sny + r02 * snz   # ns' = R ns
            nsy = r10 * snx + r11 * sny + r12 * snz
            nsz = r20 * snx + r21 * sny + r22 * snz
            ome = 1.0 - d2d_epsilon
            c00 = 2.0 - ome * (nx * nx + nsx * nsx)
            c01 = -ome * (nx * ny + nsx * nsy)
            c02 = -ome * (nx * nz + nsx * nsz)
            c11 = 2.0 - ome * (ny * ny + nsy * nsy)
            c12 = -ome * (ny * nz + nsy * nsz)
            c22 = 2.0 - ome * (nz * nz + nsz * nsz)
            # Symmetric adjugate inverse; C's eigenvalues live in
            # [2 eps, 2], so det >= 8 eps^3 > 0 and no sign guard is
            # needed.
            co00 = c11 * c22 - c12 * c12
            co01 = c02 * c12 - c01 * c22
            co02 = c01 * c12 - c02 * c11
            co11 = c00 * c22 - c02 * c02
            co12 = c01 * c02 - c00 * c12
            co22 = c00 * c11 - c01 * c01
            det = c00 * co00 + c01 * co01 + c02 * co02
            invd = w / jnp.maximum(det, 1e-20)
            m00 = co00 * invd
            m01 = co01 * invd
            m02 = co02 * invd
            m11 = co11 * invd
            m12 = co12 * invd
            m22 = co22 * invd

            # J = [-[a]x | I] columns; u_j = M @ col_j.
            us = (
                (-az * m01 + ay * m02, -az * m11 + ay * m12,
                 -az * m12 + ay * m22),
                (az * m00 - ax * m02, az * m01 - ax * m12,
                 az * m02 - ax * m22),
                (-ay * m00 + ax * m01, -ay * m01 + ax * m11,
                 -ay * m02 + ax * m12),
                (m00, m01, m02), (m01, m11, m12), (m02, m12, m22))

            def dot_col(i, vx, vy, vz):
                # col_i . v for the sparse jacobian columns above.
                if i == 0:
                    return -az * vy + ay * vz
                if i == 1:
                    return az * vx - ax * vz
                if i == 2:
                    return -ay * vx + ax * vy
                return (vx, vy, vz)[i - 3]

            wrx = m00 * rx + m01 * ry + m02 * rz
            wry = m01 * rx + m11 * ry + m12 * rz
            wrz = m02 * rx + m12 * ry + m22 * rz
            h = [[None] * 6 for _ in range(6)]
            gv = [None] * 6
            for i in range(6):
                for jj in range(i, 6):
                    h[i][jj] = dot_col(i, *us[jj]).sum(
                        axis=1, keepdims=True)
                gv[i] = -dot_col(i, wrx, wry, wrz).sum(
                    axis=1, keepdims=True)
            # Mahalanobis residual (M already carries w; w^2 = w).
            res2 = rx * wrx + ry * wry + rz * wrz
        if not exact:
            e = nx * cx + ny * cy + nz * cz - nq
            # Point-to-plane jacobian: ((c - cen) x n, n).
            j0 = ay * nz - az * ny
            j1 = az * nx - ax * nz
            j2 = ax * ny - ay * nx
            js = (j0, j1, j2, nx, ny, nz)

            h = [[None] * 6 for _ in range(6)]
            gv = [None] * 6
            for i in range(6):
                for jj in range(i, 6):
                    h[i][jj] = (js[i] * js[jj] * w).sum(axis=1,
                                                        keepdims=True)
                gv[i] = -(js[i] * e * w).sum(axis=1, keepdims=True)  # [G, 1]
            res2 = e * e                  # weighted residual for best-rmse
        if d2d and not exact:
            # Tangential half of the D2D cost (closed-form point-to-point
            # normal equations; docstring). r = c - q; note n.r == e.
            qx, qy, qz = assoc[4], assoc[5], assoc[6]
            rx, ry, rz = cx - qx, cy - qy, cz - qz
            cxs = (ax * ax * w).sum(axis=1, keepdims=True)
            cys = (ay * ay * w).sum(axis=1, keepdims=True)
            czs = (az * az * w).sum(axis=1, keepdims=True)
            cxy = (ax * ay * w).sum(axis=1, keepdims=True)
            cxz = (ax * az * w).sum(axis=1, keepdims=True)
            cyz = (ay * az * w).sum(axis=1, keepdims=True)
            sx_ = (ax * w).sum(axis=1, keepdims=True)
            sy_ = (ay * w).sum(axis=1, keepdims=True)
            sz_ = (az * w).sum(axis=1, keepdims=True)
            h[0][0] += wpp * (cys + czs)
            h[0][1] += wpp * (-cxy)
            h[0][2] += wpp * (-cxz)
            h[0][4] += wpp * (-sz_)
            h[0][5] += wpp * sy_
            h[1][1] += wpp * (cxs + czs)
            h[1][2] += wpp * (-cyz)
            h[1][3] += wpp * sz_
            h[1][5] += wpp * (-sx_)
            h[2][2] += wpp * (cxs + cys)
            h[2][3] += wpp * (-sy_)
            h[2][4] += wpp * sx_
            h[3][3] += wpp * count
            h[4][4] += wpp * count
            h[5][5] += wpp * count
            cr0 = ay * rz - az * ry
            cr1 = az * rx - ax * rz
            cr2 = ax * ry - ay * rx
            for i, t in enumerate((cr0, cr1, cr2, rx, ry, rz)):
                gv[i] += -wpp * (t * w).sum(axis=1, keepdims=True)
            res2 = res2 + wpp * (rx * rx + ry * ry + rz * rz)
            if sym:
                # Source-covariance plane term: residual along the
                # source normal rotated by the current estimate
                # (docstring; sign-invariant, so unsigned normals are
                # fine).
                nsx = r00 * snx + r01 * sny + r02 * snz
                nsy = r10 * snx + r11 * sny + r12 * snz
                nsz = r20 * snx + r21 * sny + r22 * snz
                e2 = nsx * rx + nsy * ry + nsz * rz
                k0 = ay * nsz - az * nsy
                k1 = az * nsx - ax * nsz
                k2 = ax * nsy - ay * nsx
                ks = (k0, k1, k2, nsx, nsy, nsz)
                for i in range(6):
                    for jj in range(i, 6):
                        h[i][jj] += (ks[i] * ks[jj] * w).sum(
                            axis=1, keepdims=True)
                    gv[i] += -(ks[i] * e2 * w).sum(axis=1, keepdims=True)
                res2 = res2 + e2 * e2
        ok = count >= 6.0                                          # [G, 1]
        active = done < 0.5
        # RMSE of the (weighted) residual at the CURRENT transform: used to
        # track the best-so-far pose (GN on quantised depth oscillates; the
        # last iterate is not the best one).
        rmse = jnp.sqrt((res2 * w).sum(axis=1, keepdims=True)
                        / jnp.maximum(count, 1.0))
        improved = ok & (rmse < best_rmse) & active
        new_best_rmse = jnp.where(improved, rmse, best_rmse)
        new_best_tf = tuple(
            jnp.where(improved, c, bv) for c, bv in zip(cur_tf, best_tf))

        if exact:
            # Marquardt diagonal scaling, as icp_gicp_batch: an isotropic
            # trace floor would drown exactly the weak tangential
            # directions the D2D weights leave.
            for i in range(6):
                h[i][i] = h[i][i] * (1.0 + damping) + 1e-9
        else:
            trace = (h[0][0] + h[1][1] + h[2][2]
                     + h[3][3] + h[4][4] + h[5][5])
            lam = damping * trace / 6.0 + 1e-9
            for i in range(6):
                h[i][i] = h[i][i] + lam
        # Guard: identity system when under-determined -> xi = 0 (g scaled 0).
        okf = jnp.where(ok, 1.0, 0.0)
        for i in range(6):
            for jj in range(i, 6):
                base = 1.0 if i == jj else 0.0
                h[i][jj] = okf * h[i][jj] + (1.0 - okf) * base
            gv[i] = okf * gv[i]

        # Unrolled 6x6 Cholesky solve on [G, 1] sublane vectors.
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
            ssum = gv[i]
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
        if d2d:
            # Recompose the centred update as a camera-frame transform:
            # x' = E (x - cen) + cen + u  =>  u_cam = u + cen - E cen.
            nt0 = nt0 + cenx - (e00 * cenx + e01 * ceny + e02 * cenz)
            nt1 = nt1 + ceny - (e10 * cenx + e11 * ceny + e12 * cenz)
            nt2 = nt2 + cenz - (e20 * cenx + e21 * ceny + e22 * cenz)
        raw_cur = (nr00, nr01, nr02, nr10, nr11, nr12, nr20, nr21, nr22,
                   nt0, nt1, nt2)
        # Freeze converged poses: their transform stops evolving, so the
        # result is identical to a solo per-pose early exit.
        new_cur = tuple(
            jnp.where(active, nv, cv) for nv, cv in zip(raw_cur, cur_tf))
        # Per-pose early exit: step-epsilon convergence, or no significant
        # best-rmse improvement for `stagnation_streak` iterations (paired
        # accuracy pricing in the module docstring / config.py).
        rot_n2 = wx * wx + wy * wy + wz * wz
        trn_n2 = xi[3] * xi[3] + xi[4] * xi[4] + xi[5] * xi[5]
        if nn_every == 0:
            # Accumulate this step's point-motion upper bound: the update
            # rotates about the origin (p2p) / the correspondence centroid
            # (d2d), and ax/ay/az are the points in exactly that frame, so
            # max |a| is the rotation lever arm. Frozen poses do not move
            # and stop accumulating.
            ext = jnp.sqrt(jnp.max(ax * ax + ay * ay + az * az,
                                   axis=1, keepdims=True))
            motion = theta * ext + jnp.sqrt(trn_n2)
            accum = jnp.where(active, accum + motion, accum)
        step_small = (rot_n2 < rot_eps_sq) & (trn_n2 < trn_eps_sq)
        improved_sig = rmse < best_rmse - 1e-6
        new_streak = jnp.where(improved_sig, jnp.zeros_like(streak),
                               streak + 1.0)
        new_streak = jnp.where(active, new_streak, streak)
        done_now = step_small | (new_streak >= stagnation_streak) | (~ok)
        new_done = jnp.where(active & done_now, jnp.ones_like(done), done)
        all_done = new_done.min() > 0.5
        next_k = jnp.where(all_done, jnp.int32(max_iterations), k + 1)
        return (next_k, new_cur, new_best_tf, new_best_rmse, new_streak,
                new_done, assoc, accum)

    ones = jnp.ones((g, 1), jnp.float32)
    zeros = jnp.zeros((g, 1), jnp.float32)
    zgp = jnp.zeros((g, p), jnp.float32)
    ident = (ones, zeros, zeros, zeros, ones, zeros, zeros, zeros, ones,
             zeros, zeros, zeros)
    init = (jnp.int32(0), ident, ident, jnp.full((g, 1), np.inf, jnp.float32),
            zeros, zeros, tuple(zgp for _ in range(n_attr + 1)), zeros)
    final_carry = jax.lax.while_loop(
        lambda c: c[0] < max_iterations, body, init)
    final = final_carry[2]

    rows = jax.lax.broadcasted_iota(jnp.int32, (g, 8, 128), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, 8, 128), 2)
    out = jnp.zeros((g, 8, 128), jnp.float32)
    vals = [v[:, :, None] for v in final]          # [G, 1, 1]
    for i in range(3):
        for jj in range(3):
            out = jnp.where((rows == i) & (cols == jj), vals[3 * i + jj], out)
        out = jnp.where((rows == i) & (cols == 3), vals[9 + i], out)
    out = jnp.where((rows == 3) & (cols == 3), 1.0, out)
    out_ref[:, :, :] = out


# Validity additive for invalid packed-target rows. Large finite rather
# than inf: the packed rows flow through one-hot MXU gathers
# (gather_rows_onehot) where 0 * inf would poison every output with NaN,
# and the kernel only ever uses the additive against the correspondence
# threshold (d + BIG > max_corr_sq in every case; f32 max is 3.4e38 so
# BIG + |t|^2 + |c|^2 cannot overflow at scene scales).
_INVALID_ADD = 1e30


def pack_targets(tgt_xyz: jax.Array, tgt_valid: jax.Array,
                 tgt_normals: jax.Array) -> jax.Array:
    """[..., S, 8] packed target rows for icp_fused_pallas:
    (x, y, z, nx, ny, nz, n.t, 0-or-1e30 validity additive). Pack once per
    scene/segment and gather the packed rows — one gather instead of
    three, and the plane offset n.t is computed once instead of per
    kernel iteration."""
    bt = jnp.sum(tgt_normals * tgt_xyz, axis=-1, keepdims=True)
    tadd = jnp.where(tgt_valid, 0.0, _INVALID_ADD).astype(
        jnp.float32)[..., None]
    return jnp.concatenate(
        [tgt_xyz, tgt_normals, bt, tadd], axis=-1).astype(jnp.float32)


def gather_rows_onehot(tile: jax.Array, idx: jax.Array) -> jax.Array:
    """[N, k, A] rows tile[n, idx[n, i], :] via a batched one-hot MXU
    matmul. The fine-grained take_along_axis this replaces lowers to a
    slow generic gather on TPU (~3 ms for a [2048, 256] <- [., 1024, 8]
    crop gather vs ~1 ms here); row values must be FINITE (0 * inf = NaN
    in the dot — pack_targets uses a finite validity additive for this).

    Exact for f32 inputs: each value splits into three bf16 parts (top /
    mid / low significand slices — 24 bits covered), each part is
    recovered by a single-term one-hot product (no accumulation), and the
    f32 recombination hi + mid + lo is exact because the parts' exponent
    ranges are disjoint.

    TWO XLA rewrites break a naive implementation of this split on TPU
    (both caught on-chip in round 5 — outputs came back EQUAL TO THE HI
    PART, i.e. the whole tile rounded to bf16, ~2e-3 relative error;
    measured end-to-end that walked a single-plane ICP segment 53 mm off
    its ground-truth pose because the rounded normals corrupt the
    near-singular point-to-plane GN):
      1. excess-precision elision folds the f32->bf16->f32 round-trip
         `tile - hi.astype(f32)` into `tile - tile = 0`, zeroing the
         mid/lo parts at trace time — so the split must use
         `lax.reduce_precision` (semantic rounding, never elided), and
      2. the algebraic simplifier can factor
         dot(oh, hi) + dot(oh, mid) + dot(oh, lo) into
         dot(oh, hi + mid + lo) with the sum in bf16 — the
         optimization_barrier pins the three part-dots apart.
    `test_tpu_lane.py::test_gather_rows_onehot_bit_exact_on_chip` is the
    on-chip regression guard."""
    s = tile.shape[-2]
    oh = (idx[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, s), 2)).astype(jnp.bfloat16)        # [N, k, S]
    hi32 = jax.lax.reduce_precision(tile, 8, 7)               # bf16 grid
    r1 = tile - hi32
    mid32 = jax.lax.reduce_precision(r1, 8, 7)
    hi = hi32.astype(jnp.bfloat16)
    mid = mid32.astype(jnp.bfloat16)
    lo = (r1 - mid32).astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    parts = jax.lax.optimization_barrier((dot(oh, hi), dot(oh, mid),
                                          dot(oh, lo)))
    return parts[0] + parts[1] + parts[2]


@functools.partial(jax.jit, static_argnames=(
    "max_iterations", "max_correspondence", "damping", "nn_every",
    "rotation_epsilon", "transformation_epsilon", "stagnation_streak",
    "d2d_epsilon", "exact", "interpret", "group", "assoc_trigger"))
def icp_fused_pallas(
    src_xyz: jax.Array,      # [N, P, 3]
    src_valid: jax.Array,    # [N, P]
    tgt_packed: jax.Array,   # [N, S, 8] pre-cropped packed targets
                             # (pack_targets)
    src_normals: jax.Array | None = None,  # [N, P, 3]: enables the
                             # symmetric source-plane term (d2d only)
    *,
    max_iterations: int = 20,
    max_correspondence: float = 0.05,
    damping: float = 1e-4,
    nn_every: int = 1,
    rotation_epsilon: float = 2e-3,
    transformation_epsilon: float = 5e-4,
    stagnation_streak: float = 8.0,
    d2d_epsilon: float = 0.0,
    exact: bool = False,
    interpret: bool = False,
    group: int | None = None,
    assoc_trigger: float = 0.004,
) -> jax.Array:
    """Camera-frame corrections [N, 4, 4] (pose' = delta @ pose).

    nn_every=0 selects ADAPTIVE association: the [S, P] NN sweep re-runs
    only when some active pose's accumulated point-motion bound since its
    last association exceeds `assoc_trigger` (meters). Early iterations
    (large steps) get per-iteration fidelity; near convergence the sweep
    amortises automatically. assoc_trigger=0 degenerates to nn_every=1;
    a huge trigger degenerates to associate-once.

    d2d_epsilon > 0 enables the GICP distribution weighting (see
    _icp_kernel). In that mode callers should pass step-norm thresholds
    ~10x tighter than the p2p defaults (the D2D weights shrink
    near-optimum GN steps — see icp_gicp_batch's convergence note);
    ScorerConfig.d2d_epsilons() resolves this. The values passed here
    are honored verbatim.

    exact=True (requires d2d_epsilon > 0 AND src_normals) switches the
    in-kernel GN to icp_gicp_batch's full 3x3 covariance formulation
    (see _icp_kernel's docstring)."""
    sym = src_normals is not None and d2d_epsilon > 0.0
    if exact and not sym:
        raise ValueError("exact=True needs d2d_epsilon > 0 and src_normals")
    grp = int(group) if group else _GROUP
    n, p, _ = src_xyz.shape
    s = tgt_packed.shape[1]
    # Pad P to lanes, S to sublanes, N to the pose group size.
    p_pad = ((p + 127) // 128) * 128
    s_pad = ((s + 7) // 8) * 8
    n_pad = ((n + grp - 1) // grp) * grp

    src_t = jnp.transpose(src_xyz, (0, 2, 1))
    if sym:
        src_t = jnp.concatenate(
            [src_t, jnp.transpose(src_normals, (0, 2, 1))], axis=1)
    src_rows = 6 if sym else 3
    if p_pad != p:
        src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, p_pad - p)))
    sadd = jnp.where(src_valid, 0.0, jnp.inf).astype(jnp.float32)[:, None, :]
    if p_pad != p:
        sadd = jnp.pad(sadd, ((0, 0), (0, 0), (0, p_pad - p)),
                       constant_values=jnp.inf)

    tgt8 = tgt_packed
    if s_pad != s:
        # Pad rows get the invalid additive so they never win the NN.
        tgt8 = jnp.pad(tgt8, ((0, 0), (0, s_pad - s), (0, 0)))
        tgt8 = tgt8.at[:, s:, 7].set(_INVALID_ADD)

    if n_pad != n:
        # Padded poses have no valid sources -> ok=False -> identity delta,
        # done after one iteration.
        src_t = jnp.pad(src_t, ((0, n_pad - n), (0, 0), (0, 0)))
        sadd = jnp.pad(sadd, ((0, n_pad - n), (0, 0), (0, 0)),
                       constant_values=jnp.inf)
        tgt8 = jnp.pad(tgt8, ((0, n_pad - n), (0, 0), (0, 0)))
        tgt8 = tgt8.at[n:, :, 7].set(_INVALID_ADD)

    kernel = functools.partial(
        _icp_kernel, g=grp, p=p_pad, s=s_pad,
        max_iterations=max_iterations,
        max_corr_sq=max_correspondence * max_correspondence, damping=damping,
        nn_every=nn_every,
        rot_eps_sq=rotation_epsilon * rotation_epsilon,
        trn_eps_sq=transformation_epsilon * transformation_epsilon,
        stagnation_streak=float(stagnation_streak),
        d2d_epsilon=float(d2d_epsilon), sym=sym, exact=bool(exact),
        assoc_trigger=float(assoc_trigger))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // grp,),
        in_specs=[
            pl.BlockSpec((grp, src_rows, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, 1, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s_pad, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((grp, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8, 128), jnp.float32),
        interpret=interpret,
    )(src_t, sadd, tgt8)
    return out[:n, :4, :4]
