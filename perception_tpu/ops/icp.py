"""Batched pose refinement: vmapped Gauss-Newton point-to-plane ICP.

TPU-native replacement for the reference's per-candidate GPU registration:
the external fast_gicp fork's `FastGICPCudaCore::optimize_multi` (one
registration problem per candidate pose, solved jointly — called at
cuda_renderer/src/cuda/renderer.cu:1688-1739 with max_iter=150,
k_correspondences=10, rotation_eps=2e-3, transformation_eps=5e-4) and the
in-repo `cuda_icp` point-to-plane ICP (cuda_icp/icp.cu:142-298: a 29-float
tight Gauss-Newton accumulator reduced per iteration, 6x6 solve on host).

Design:
  * All N candidate poses refine simultaneously: residual construction and
    the 6x6 normal-equation accumulation are einsums over [N, P]
    correspondences; the 6x6 solves are a batched `jnp.linalg.solve`.
  * Target normals come from per-segment covariance smallest-eigenvectors
    computed by shifted power iteration (no eigh in the hot path).
  * Fixed iteration count with masked convergence (XLA-static control flow):
    converged poses stop moving but stay in the batch, mirroring the
    reference's per-pose early-exit epsilons.
  * Updates compose in the camera frame on the left: pose' = exp(xi) @ pose,
    matching fast_gicp's estimated-then-concatenate contract
    (renderer.cu:1722-1730 `concatenate_transforms`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def so3_exp(omega: jax.Array) -> jax.Array:
    """Batched SO(3) exponential map [.., 3] -> [.., 3, 3] (Rodrigues)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    axis = omega / theta
    theta = theta[..., None]
    k = _hat(axis)
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    return eye + jnp.sin(theta) * k + (1 - jnp.cos(theta)) * (k @ k)


def _hat(v: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
    ], axis=-2)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Batched SE(3)-style update [.., 6] (omega, t) -> [.., 4, 4].

    First-order in translation (rotation exact), matching the small-step GN
    updates of the reference solvers (eigen_slover_666 builds the same
    linearised transform).
    """
    rot = so3_exp(xi[..., :3])
    out = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(xi[..., 3:])
    out = out.at[..., 3, 3].set(1.0)
    return out


def smallest_eigenvector_3x3(cov: jax.Array, iters: int = 12) -> jax.Array:
    """Smallest eigenvector of symmetric [.., 3, 3] via shifted power iteration.

    M = sigma*I - C has the smallest eigenvector of C as its dominant one
    (sigma = trace upper-bounds lambda_max). Deterministic start; safeguarded
    against the start vector being orthogonal to the target by mixing in a
    second basis vector.
    """
    sigma = jnp.trace(cov, axis1=-2, axis2=-1)[..., None, None]
    m = sigma * jnp.broadcast_to(jnp.eye(3), cov.shape) - cov
    m = m @ m  # square to double the convergence rate per iteration
    v = jnp.broadcast_to(jnp.array([0.57735, 0.57735, 0.57735]), cov.shape[:-2] + (3,))
    v = v + jnp.array([0.1, -0.05, 0.02])
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", m, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    return v


@functools.partial(jax.jit, static_argnames=("k",))
def cloud_normals(xyz: jax.Array, valid: jax.Array, k: int = 10) -> jax.Array:
    """Per-point normals from k-NN covariance smallest-eigenvectors.

    xyz [B, P, 3]; normals oriented towards the camera origin (-z viewing),
    i.e. flipped so that n . p < 0 (points are in the camera frame).
    Mirrors fast_gicp covariance estimation with k_correspondences
    neighbours (renderer.cu:1697).
    """
    from perception_tpu.ops.knn import knn_self

    _, idx = knn_self(xyz, valid, k=k)
    # neighbors [B, P, k, 3] = xyz[b, idx[b, p, j]]
    neighbors = jax.vmap(lambda cloud, ind: cloud[ind])(xyz, idx)
    # Mask invalid neighbours: when a segment has < k+1 valid points,
    # knn_self returns inf-distance indices whose gathered coordinates are
    # the zero-filled invalid points; letting them into the covariance skews
    # the normals of small-but-valid segments.
    nb_valid = jax.vmap(lambda v, ind: v[ind])(valid, idx)  # [B, P, k]
    wgt = nb_valid.astype(xyz.dtype)[..., None]
    cnt = jnp.maximum(wgt.sum(axis=2, keepdims=True), 1.0)
    mean = (neighbors * wgt).sum(axis=2, keepdims=True) / cnt
    centered = (neighbors - mean) * wgt
    cov = jnp.einsum("bpki,bpkj->bpij", centered, centered) / cnt
    n = smallest_eigenvector_3x3(cov)
    # Orient towards the viewpoint (origin).
    flip = jnp.sign(-jnp.sum(n * xyz, axis=-1, keepdims=True))
    return n * jnp.where(flip == 0, 1.0, flip)


def solve_spd_6x6(h: jax.Array, g: jax.Array) -> jax.Array:
    """Batched 6x6 SPD solve via hand-unrolled Cholesky.

    XLA's batched `linalg.solve` lowers tiny LU factorisations to a slow
    generic path (~2 ms for 512 solves on v5e); unrolling the 6x6 Cholesky
    into vectorised scalar ops over the batch runs on the VPU in microseconds.
    h [N, 6, 6] SPD, g [N, 6] -> x with h x = g.
    """
    n = 6
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = h[:, j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        l[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
        inv = 1.0 / l[j][j]
        for i in range(j + 1, n):
            s = h[:, i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    # Forward substitution L y = g.
    y = [None] * n
    for i in range(n):
        s = g[:, i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x, axis=1)


def crop_targets(tgt_xyz: jax.Array, tgt_valid: jax.Array,
                 centers: jax.Array, k: int,
                 mode: str = "near") -> jax.Array:
    """Indices [N, k] of a per-pose target crop — a one-time selection
    that shrinks every ICP iteration's NN sweep. Invalid targets sort
    last and stay invalid after the gather.

    Uses TPU-optimised `approx_max_k` (recall ~0.95): the crop is a
    preselection with a generous margin around the object, so swapping a
    few boundary points for slightly farther ones does not change the
    in-range correspondences the GN steps actually use. (Exact top_k
    lowers to a full sort on TPU — measured several ms per 2048-pose
    batch.)

    mode="near" (default): the plain k nearest. Round-4 probe notes: at
    small k this keeps only a flat central patch of a large close-up
    object face, and point-to-plane GN on a single plane is tangentially
    unconstrained — plain k=128 from a GROUND-TRUTH start drifted 581 mm
    on the camera_loop frame. k=128 is aggregate-neutral on the
    150-scene ladder (icp_crop_128 rung, paired -0.05 [-1.24, +1.22])
    but carries that single-plane tail risk, so the accuracy-first
    default stays 256 and the perf profile opts into 128.

    mode="spread": valid-preferring interleave over the ~2k nearest —
    the spatial EXTENT of a 2k-crop at half density. Round-5 probe
    (/tmp-era camera-loop box scene, GT start): spread@128 diverges the
    SAME 581 mm as near@128 — doubling the extent does not rescue a
    single-plane close-up, because the degeneracy is the pure
    point-to-plane objective (the fused kernel runs pp_weight=0;
    tangential directions are unconstrained on one plane), not the
    selection density. So spread does NOT unlock crop=128 as a default;
    it remains an opt-in selection for sparse/ragged segments. Candidates
    are ranked (invalid last) by (position parity, position / 2) over
    the distance-ordered 2k prefix: every 2nd candidate first (the
    half-density spread), the skipped ones as densifying fill — so the
    kept VALID count stays min(V, k) rather than the plain interleave's
    ceil(V / 2) (advisor finding, round 4), and segments with fewer than
    2k candidates interleave what exists instead of falling back to the
    flat nearest-k patch."""
    d = jnp.sum((tgt_xyz - centers[:, None, :]) ** 2, axis=-1)
    d = jnp.where(tgt_valid, d, jnp.inf)
    s = tgt_xyz.shape[1]
    if mode == "near" or k >= s:
        _, idx = jax.lax.approx_max_k(-d, min(k, s))
        return idx
    if mode != "spread":
        raise ValueError(f"unknown crop mode {mode!r}")
    k2 = min(2 * k, s)
    _, idx = jax.lax.approx_max_k(-d, k2)       # ascending distance
    # approx_max_k aggregates to an exact sorted top-k2, and invalid
    # targets carry d=inf, so the candidate list's VALID entries form a
    # prefix of length V. The (invalid-last, parity, position/2) rank
    # sort therefore collapses to closed-form index arithmetic: even
    # positions of the valid prefix first (the half-density spread over
    # the full 2k extent), odd positions as densifying fill, the invalid
    # tail as-is. Equivalent to the explicit [N, 2k] rank argsort this
    # replaced, minus its ~9 ms/2048-pose batch sort cost (icp_micro:
    # spread k=128 was 14.6 ms vs 5.7 for plain k=256; the arithmetic
    # form prices at ~plain cost + the wider approx_max_k).
    cand_valid = jnp.take_along_axis(tgt_valid, idx, axis=1)
    v = jnp.sum(cand_valid, axis=1, keepdims=True)       # valid prefix len
    i = jnp.arange(k)[None, :]
    nhalf = (v + 1) // 2
    pos = jnp.where(i < nhalf, 2 * i, 2 * (i - nhalf) + 1)
    pos = jnp.where(i < v, pos, i)              # beyond V: invalid tail
    pos = jnp.minimum(pos, k2 - 1)
    return jnp.take_along_axis(idx, pos, axis=1)


def _gn_step(cur, q, nrm, w, converged, pp_weight=0.0, damping=1e-4):
    """One damped Gauss-Newton update for batched registration.

    Point-to-plane residuals plus a down-weighted point-to-point term: pure
    plane residuals leave in-plane directions unconstrained on flat scenes,
    and the resulting near-singular normal equations produce wild tangential
    steps (fast_gicp's full mahalanobis distribution-to-distribution cost
    has the same stabilising effect). Damping is scaled to diag(H)
    (Levenberg-Marquardt style). No step clamping: clamped partial steps
    re-trigger the same descent direction every iteration and turn GN's
    benign overshoot-and-return oscillation into a monotone runaway
    (observed experimentally on flat synthetic scenes).

    Returns (xi [N,6], count [N], e_plane [N,P], ok [N]).
    """
    e = jnp.sum(nrm * (cur - q), axis=-1)                   # [N, P]
    j_rot = jnp.cross(cur, nrm)                             # [N, P, 3]
    jac = jnp.concatenate([j_rot, nrm], axis=-1)            # [N, P, 6]
    jw = jac * w[..., None]
    # Batched matmul accumulation (MXU at f32-accurate precision) instead of
    # a [N, P, 6, 6] elementwise+reduce einsum.
    h = jax.lax.dot_general(jw, jac, (((1,), (1,)), ((0,), (0,))),
                            precision=jax.lax.Precision.HIGHEST)
    g = -jnp.einsum("npi,np->ni", jw, e)

    if pp_weight > 0:
        # Point-to-point: r = cur - q, dr/domega = -[cur]x, dr/du = I.
        r = cur - q                                         # [N, P, 3]
        cx = _hat(cur)                                      # [N, P, 3, 3]
        j_pp = jnp.concatenate(
            [-cx, jnp.broadcast_to(jnp.eye(3), cx.shape)], axis=-1)  # [N,P,3,6]
        h = h + pp_weight * jnp.einsum("npki,npkj,np->nij", j_pp, j_pp, w)
        g = g - pp_weight * jnp.einsum("npki,npk,np->ni", j_pp, r, w)

    count = w.sum(axis=1)
    ok = count >= 6
    diag = jnp.diagonal(h, axis1=1, axis2=2)
    h = h + (damping * diag.mean(axis=1)[:, None, None] + 1e-9) * jnp.eye(6)
    h = jnp.where(ok[:, None, None], h, jnp.eye(6))
    xi = solve_spd_6x6(h, g)
    xi = jnp.where((ok & ~converged)[:, None], xi, 0.0)
    return xi, count, e, ok


@functools.partial(jax.jit, static_argnames=(
    "max_iterations", "width", "height", "stride", "use_labels"))
def icp_projective_batch(
    src_xyz: jax.Array,      # [N, P, 3] rendered cloud per pose (camera, m)
    src_valid: jax.Array,    # [N, P]
    obs_xyz: jax.Array,      # [Npix, 3] organised observed map (strided grid)
    obs_normals: jax.Array,  # [Npix, 3]
    obs_valid: jax.Array,    # [Npix]
    obs_label: jax.Array,    # [Npix] int32 0-based (-1 invalid)
    pose_labels: jax.Array,  # [N] int32
    *,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, stride: int,
    max_iterations: int = 30,
    max_correspondence: float = 0.05,
    rotation_epsilon: float = 2e-3,
    transformation_epsilon: float = 5e-4,
    damping: float = 1e-4,
    use_labels: bool = True,
) -> "ICPResult":
    """Point-to-plane GN with projective data association.

    Correspondences come from projecting each (transformed) source point
    into the organised observed image and reading the point/normal at that
    pixel — the reference's own `Scene_projective` strategy
    (cuda_icp/scene/depth_scene, used by ICP_Point2Plane) — which makes the
    per-iteration cost O(P) gathers instead of an O(P*S) NN sweep.
    Label gating mirrors the label-partitioned NN of the 6-DoF path.
    """
    n, p, _ = src_xyz.shape
    w_s, h_s = width // stride, height // stride
    npix = w_s * h_s
    max_corr_sq = max_correspondence * max_correspondence

    def body(carry, _):
        delta, converged, iters = carry
        cur = (jnp.einsum("nij,npj->npi", delta[:, :3, :3], src_xyz)
               + delta[:, None, :3, 3])
        z = jnp.maximum(cur[..., 2], 1e-6)
        u = fx * cur[..., 0] / z + cx
        v = fy * cur[..., 1] / z + cy
        iu = jnp.clip(jnp.round(u / stride).astype(jnp.int32), 0, w_s - 1)
        iv = jnp.clip(jnp.round(v / stride).astype(jnp.int32), 0, h_s - 1)
        pix = iv * w_s + iu                              # [N, P]
        q = obs_xyz[pix]                                 # [N, P, 3]
        nrm = obs_normals[pix]
        ok = src_valid & obs_valid[pix] & (cur[..., 2] > 1e-4)
        if use_labels:
            ok &= obs_label[pix] == pose_labels[:, None]
        dist_sq = jnp.sum((cur - q) ** 2, axis=-1)
        w = (ok & (dist_sq <= max_corr_sq)).astype(jnp.float32)

        xi, count, e, okp = _gn_step(cur, q, nrm, w, converged,
                                     pp_weight=0.1, damping=damping)
        step = se3_exp(xi)
        new_delta = jnp.einsum("nij,njk->nik", step, delta)

        rot_small = jnp.linalg.norm(xi[:, :3], axis=1) < rotation_epsilon
        trans_small = jnp.linalg.norm(xi[:, 3:], axis=1) < transformation_epsilon
        newly = rot_small & trans_small
        iters = iters + (~converged).astype(jnp.int32)
        converged = converged | newly | ~okp

        mse = jnp.sum(e * e * w, axis=1) / jnp.maximum(count, 1.0)
        fitness = count / jnp.maximum(src_valid.sum(axis=1), 1.0)
        return (new_delta, converged, iters), (fitness, jnp.sqrt(mse))

    init = (jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32))
    (delta, _, iters), (fit_hist, rmse_hist) = jax.lax.scan(
        body, init, None, length=max_iterations)
    return ICPResult(delta=delta, fitness=fit_hist[-1], rmse=rmse_hist[-1],
                     iterations=iters)


class ICPResult(NamedTuple):
    delta: jax.Array       # [N, 4, 4] camera-frame correction (pose' = delta @ pose)
    fitness: jax.Array     # [N] inlier fraction at convergence
    rmse: jax.Array        # [N] inlier RMSE (m)
    iterations: jax.Array  # [N] int32 iterations until convergence


@functools.partial(jax.jit, static_argnames=("max_iterations", "ref_tile",
                                             "crop_k", "backend"))
def icp_point_to_plane_batch(
    src_xyz: jax.Array,      # [N, P, 3] rendered cloud per pose (camera frame, m)
    src_valid: jax.Array,    # [N, P]
    tgt_xyz: jax.Array,      # [N, S, 3] observed segment per pose
    tgt_valid: jax.Array,    # [N, S]
    tgt_normals: jax.Array,  # [N, S, 3]
    *,
    max_iterations: int = 30,
    max_correspondence: float = 0.05,   # m (PERCHParams icp_max_correspondence)
    rotation_epsilon: float = 2e-3,
    transformation_epsilon: float = 5e-4,
    damping: float = 1e-4,
    ref_tile: int = 512,
    crop_k: int = 0,
    backend: str = "xla",
) -> ICPResult:
    """Refine all poses against their observed segments simultaneously.

    crop_k > 0 shrinks each pose's target set once to the crop_k points
    nearest its source centroid (covers the object + max_correspondence
    margin), cutting every iteration's NN sweep proportionally.
    """
    from perception_tpu.ops.knn import nn1_batch

    n, p, _ = src_xyz.shape
    max_corr_sq = max_correspondence * max_correspondence

    if crop_k and crop_k < tgt_xyz.shape[1]:
        centers = (jnp.sum(src_xyz * src_valid[..., None], axis=1)
                   / jnp.maximum(src_valid.sum(axis=1), 1)[:, None])
        idx = crop_targets(tgt_xyz, tgt_valid, centers, crop_k)
        tgt_xyz = jnp.take_along_axis(tgt_xyz, idx[..., None], axis=1)
        tgt_normals = jnp.take_along_axis(tgt_normals, idx[..., None], axis=1)
        tgt_valid = jnp.take_along_axis(tgt_valid, idx, axis=1)

    def nn_fn(q, qv, r, rv):
        if backend.startswith("pallas"):
            from perception_tpu.ops.pallas_knn import nn1_batch_pallas

            return nn1_batch_pallas(q, qv, r, rv,
                                    interpret=backend.endswith("interpret"))
        return nn1_batch(q, qv, r, rv, ref_tile=ref_tile)

    def body(carry):
        k, delta, converged, iters, _, _, _ = carry
        cur = jnp.einsum("nij,npj->npi", delta[:, :3, :3], src_xyz) + delta[:, None, :3, 3]
        dist_sq, idx = nn_fn(cur, src_valid, tgt_xyz, tgt_valid)
        q = jnp.take_along_axis(tgt_xyz, idx[..., None], axis=1)
        nrm = jnp.take_along_axis(tgt_normals, idx[..., None], axis=1)
        w = (src_valid & (dist_sq <= max_corr_sq)).astype(jnp.float32)

        xi, count, e, ok = _gn_step(cur, q, nrm, w, converged,
                                    pp_weight=0.0, damping=damping)
        step = se3_exp(xi)
        new_delta = jnp.einsum("nij,njk->nik", step, delta)

        mse = jnp.sum(e * e * w, axis=1) / jnp.maximum(count, 1.0)
        fitness = count / jnp.maximum(src_valid.sum(axis=1), 1.0)
        rmse = jnp.sqrt(mse)

        rot_small = jnp.linalg.norm(xi[:, :3], axis=1) < rotation_epsilon
        trans_small = jnp.linalg.norm(xi[:, 3:], axis=1) < transformation_epsilon
        # Second criterion: relative fitness/rmse stagnation, the in-repo
        # cuda_icp convergence test (icp.h ICPConvergenceCriteria 1e-5 /
        # icp.cu:196-199). On cm-quantised depth the epsilon-step test alone
        # rarely fires (GN oscillates at ~mm scale). A single stagnant
        # iteration is often just a mid-basin plateau (measured accuracy
        # regression when firing immediately), so require a 3-iteration
        # streak.
        prev_fit, prev_rmse, streak = carry[4], carry[5], carry[6]
        stagnant = ((jnp.abs(fitness - prev_fit) < 1e-5)
                    & (jnp.abs(rmse - prev_rmse) < 1e-6) & (k > 0))
        streak = jnp.where(stagnant, streak + 1, 0)
        newly = (rot_small & trans_small) | (streak >= 3)
        iters = iters + (~converged).astype(jnp.int32)
        converged = converged | newly | ~ok
        return (k + 1, new_delta, converged, iters, fitness, rmse, streak)

    # while_loop instead of a fixed-trip scan: the whole batch usually
    # converges well before max_iterations (the reference's per-pose
    # epsilon exits, batched: stop when every pose is done).
    def cond(carry):
        k, _, converged, *_ = carry
        return (k < max_iterations) & ~jnp.all(converged)

    init = (jnp.int32(0), jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32))
    _, delta, _, iters, fitness, rmse, _ = jax.lax.while_loop(cond, body, init)
    return ICPResult(delta=delta, fitness=fitness, rmse=rmse, iterations=iters)


def _inv_3x3_sym(m: jax.Array) -> jax.Array:
    """Batched symmetric 3x3 inverse via the adjugate (no LU dispatch)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    rows = jnp.stack([
        jnp.stack([co00, co01, co02], axis=-1),
        jnp.stack([co01, co11, co12], axis=-1),
        jnp.stack([co02, co12, co22], axis=-1),
    ], axis=-2)
    return rows * inv_det[..., None, None]


@functools.partial(jax.jit, static_argnames=("max_iterations", "ref_tile",
                                             "crop_k", "backend"))
def icp_gicp_batch(
    src_xyz: jax.Array,      # [N, P, 3] rendered cloud per pose (camera, m)
    src_valid: jax.Array,    # [N, P]
    src_normals: jax.Array,  # [N, P, 3] source surface normals (initial frame)
    tgt_xyz: jax.Array,      # [N, S, 3] observed segment per pose
    tgt_valid: jax.Array,    # [N, S]
    tgt_normals: jax.Array,  # [N, S, 3]
    *,
    max_iterations: int = 30,
    max_correspondence: float = 0.05,
    rotation_epsilon: float = 2e-4,
    transformation_epsilon: float = 5e-5,
    damping: float = 1e-4,
    gicp_epsilon: float = 1e-3,
    ref_tile: int = 512,
    crop_k: int = 0,
    backend: str = "xla",
) -> ICPResult:
    """Distribution-to-distribution (GICP) batched refinement.

    The reference registers each candidate with fast_gicp's Mahalanobis D2D
    cost (renderer.cu:1693-1720: k=10 covariances on both clouds, residual
    d^T (C_t + R C_s R^T)^-1 d). TPU-native formulation: GICP's
    plane-regularised covariance R_eig diag(1,1,eps) R_eig^T equals
    I - (1-eps) n n^T for unit normal n (the smallest eigenvector), so both
    covariances reduce to the normals we already estimate — no per-point
    3x3 eigendecompositions in the loop, and the rotated source covariance
    R C_s R^T is just the rotated source normal. The per-correspondence
    3x3 weight inverse is a closed-form adjugate. Full 3-vector residual
    GN (J = [-[c]x | I]) with the same damping contract as
    icp_point_to_plane_batch.

    Convergence: the *default* step-norm thresholds are 10x tighter than
    the p2p solver's (2e-4/5e-5 vs fast_gicp's 2e-3/5e-4,
    renderer.cu:1696-1699). The D2D weights scale H by ~1/(2 eps)
    (~500x) along the constrained (normal) directions, so near the
    optimum each GN step is intrinsically smaller than a p2p step for
    the same residual — a step-norm test calibrated for p2p declares
    convergence ~2 cm early (measured on the curved-patch probe: p2p
    thresholds stall at 18-28 mm in 17-30 iterations; 10x-tightened
    thresholds reach < 0.1 mm in 35-49; this, stacked on the round-2
    centroid fix, was the remaining 'gicp AUC collapse').
    Caller-supplied epsilons are honored verbatim (no hidden rescaling).
    """
    from perception_tpu.ops.knn import nn1_batch

    n, p, _ = src_xyz.shape
    max_corr_sq = max_correspondence * max_correspondence
    one_m_eps = 1.0 - gicp_epsilon

    if crop_k and crop_k < tgt_xyz.shape[1]:
        centers = (jnp.sum(src_xyz * src_valid[..., None], axis=1)
                   / jnp.maximum(src_valid.sum(axis=1), 1)[:, None])
        idx = crop_targets(tgt_xyz, tgt_valid, centers, crop_k)
        tgt_xyz = jnp.take_along_axis(tgt_xyz, idx[..., None], axis=1)
        tgt_normals = jnp.take_along_axis(tgt_normals, idx[..., None], axis=1)
        tgt_valid = jnp.take_along_axis(tgt_valid, idx, axis=1)

    def nn_fn(q, qv, r, rv):
        if backend.startswith("pallas"):
            from perception_tpu.ops.pallas_knn import nn1_batch_pallas

            return nn1_batch_pallas(q, qv, r, rv,
                                    interpret=backend.endswith("interpret"))
        return nn1_batch(q, qv, r, rv, ref_tile=ref_tile)

    eye3 = jnp.eye(3)

    def body(carry):
        k, delta, converged, iters, prev_fit, prev_rmse, streak = carry
        rot = delta[:, :3, :3]
        cur = jnp.einsum("nij,npj->npi", rot, src_xyz) + delta[:, None, :3, 3]
        dist_sq, idx = nn_fn(cur, src_valid, tgt_xyz, tgt_valid)
        q = jnp.take_along_axis(tgt_xyz, idx[..., None], axis=1)
        nt = jnp.take_along_axis(tgt_normals, idx[..., None], axis=1)
        w = (src_valid & (dist_sq <= max_corr_sq)).astype(jnp.float32)

        # Combined covariance C = C_t + R C_s R^T
        #   = 2 I - (1-eps)(nt nt^T + ns' ns'^T), ns' = R ns.
        ns = jnp.einsum("nij,npj->npi", rot, src_normals)
        cmb = (2.0 * eye3
               - one_m_eps * (nt[..., :, None] * nt[..., None, :]
                              + ns[..., :, None] * ns[..., None, :]))
        wmat = _inv_3x3_sym(cmb) * w[..., None, None]        # [N, P, 3, 3]

        r3 = cur - q                                          # [N, P, 3]
        count = w.sum(axis=1)
        # Rotate about the per-pose correspondence centroid, not the camera
        # origin: at ~0.6 m range the origin-lever-arm couples rotation and
        # translation with a conditioning penalty of (range/extent)^2 ~ 30x,
        # which STACKS with the D2D weights' 1/(2 eps) ~ 500x anisotropy —
        # the f32 normal equations then stall 1-3 cm from the optimum
        # (measured: analytic-normal probe errs 14-28 mm un-centred vs
        # sub-mm centred; the round-2 '47.5 AUC gicp collapse' was exactly
        # this, not a formulation problem).
        cen = (jnp.sum(cur * w[..., None], axis=1)
               / jnp.maximum(count, 1.0)[:, None])             # [N, 3]
        cx = _hat(cur - cen[:, None, :])                       # [N, P, 3, 3]
        jac = jnp.concatenate(
            [-cx, jnp.broadcast_to(eye3, cx.shape)], axis=-1)  # [N, P, 3, 6]
        wj = jnp.einsum("npab,npbj->npaj", wmat, jac)          # [N, P, 3, 6]
        h = jnp.einsum("npai,npaj->nij", jac, wj)
        g = -jnp.einsum("npaj,npa->nj", wj, r3)

        ok = count >= 6
        # Marquardt diagonal scaling (lambda * diag(H), not lambda *
        # mean-trace * I): an isotropic floor drowns exactly the weak
        # tangential directions the D2D weights leave.
        diag = jnp.diagonal(h, axis1=1, axis2=2)
        h = h + jnp.eye(6) * (damping * diag + 1e-9)[:, None, :]
        h = jnp.where(ok[:, None, None], h, jnp.eye(6))
        xi = solve_spd_6x6(h, g)
        xi = jnp.where((ok & ~converged)[:, None], xi, 0.0)
        step = se3_exp(xi)
        # Recompose the centred update as a camera-frame transform:
        # x' = R_s (x - c) + c + t_s.
        step = step.at[:, :3, 3].add(
            cen - jnp.einsum("nij,nj->ni", step[:, :3, :3], cen))
        new_delta = jnp.einsum("nij,njk->nik", step, delta)

        # Mahalanobis mean residual for the stagnation test.
        mres = (jnp.einsum("npa,npab,npb->np", r3, wmat, r3)).sum(axis=1)
        mse = mres / jnp.maximum(count, 1.0)
        fitness = count / jnp.maximum(src_valid.sum(axis=1), 1.0)
        rmse = jnp.sqrt(jnp.maximum(mse, 0.0))

        rot_small = jnp.linalg.norm(xi[:, :3], axis=1) < rotation_epsilon
        trans_small = jnp.linalg.norm(xi[:, 3:], axis=1) < transformation_epsilon
        stagnant = ((jnp.abs(fitness - prev_fit) < 1e-5)
                    & (jnp.abs(rmse - prev_rmse) < 1e-6) & (k > 0))
        streak = jnp.where(stagnant, streak + 1, 0)
        newly = (rot_small & trans_small) | (streak >= 3)
        iters = iters + (~converged).astype(jnp.int32)
        converged = converged | newly | ~ok
        return (k + 1, new_delta, converged, iters, fitness, rmse, streak)

    def cond(carry):
        k, _, converged, *_ = carry
        return (k < max_iterations) & ~jnp.all(converged)

    init = (jnp.int32(0), jnp.broadcast_to(jnp.eye(4), (n, 4, 4)),
            jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.int32))
    _, delta, _, iters, fitness, rmse, _ = jax.lax.while_loop(cond, body, init)
    return ICPResult(delta=delta, fitness=fitness, rmse=rmse, iterations=iters)
