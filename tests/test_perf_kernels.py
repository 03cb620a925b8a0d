"""Parity tests for the performance kernels (Pallas interpret mode on CPU)
and the ROI/projective fast paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.core.pose import euler_xyz_to_matrix
from perception_tpu.ops.pallas_knn import nn1_batch_pallas
from perception_tpu.ops.pallas_raster import pack_coefficients, rasterize_keys_pallas
from perception_tpu.ops.knn import nn1_batch
from perception_tpu.ops.rasterizer import (
    compute_roi_anchors,
    render_pose_batch,
    screen_vertices,
    triangle_coefficients,
)

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=160.0, fy=160.0, cx=64.0, cy=48.0, width=128, height=96)


def _setup(n_poses=3, seed=0):
    rng = np.random.default_rng(seed)
    verts, faces = make_box(0.15, 0.12, 0.1)
    model = mesh_model_from_arrays("box", verts, faces)
    bank = ModelBank.from_models([model], t_cap=16)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_poses, 1, 1))
    for i in range(n_poses):
        poses[i, :3, :3] = euler_xyz_to_matrix(*rng.uniform(-1, 1, 3))
        poses[i, :3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                           rng.uniform(0.6, 0.8)]
    return bank, poses


def test_pallas_raster_interpret_matches_xla():
    bank, poses = _setup()
    ids = np.zeros(len(poses), np.int32)
    proj = jnp.asarray(CAM.projection())

    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        width=CAM.width, height=CAM.height, stride=2, tile=16, backend="xla")

    def setup_one(tv, ok, pose):
        v_cam = (jnp.einsum("ij,tvj->tvi", pose[:3, :3], tv) + pose[:3, 3]) * 100.0
        pts2, z = screen_vertices(v_cam, proj, CAM.width, CAM.height)
        return triangle_coefficients(pts2, z, ok)

    tri_v = bank.tri_verts[ids]
    tri_ok = bank.tri_valid[ids]
    coefs, aux, cok = jax.vmap(setup_one)(
        jnp.asarray(tri_v), jnp.asarray(tri_ok), jnp.asarray(poses))
    packed = pack_coefficients(coefs, aux, cok)
    keys = rasterize_keys_pallas(packed, width=CAM.width, height=CAM.height,
                                 stride=2, interpret=True)
    from perception_tpu.ops.rasterizer import _INVALID_KEY, TRI_ID_BITS

    depth = np.where(np.asarray(keys) == _INVALID_KEY, 0,
                     np.asarray(keys) >> TRI_ID_BITS)
    # w-max packing: +/-1 unit on rounding-boundary pixels (see the direct-
    # kernel parity test below); coverage must match exactly.
    d_ref = np.asarray(ref.depth)
    d_out = depth.reshape(d_ref.shape)
    np.testing.assert_array_equal(d_out > 0, d_ref > 0)
    dd = np.abs(d_out.astype(np.int64) - d_ref.astype(np.int64))
    assert dd.max() <= 1 and (dd > 0).mean() < 0.005


def test_pallas_raster_roi_interpret():
    bank, poses = _setup()
    ids = np.zeros(len(poses), np.int32)
    proj = jnp.asarray(CAM.projection())
    roi = (24, 24)

    full = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        width=CAM.width, height=CAM.height, stride=2, tile=16, backend="xla")

    def setup_one(tv, ok, pose):
        v_cam = (jnp.einsum("ij,tvj->tvi", pose[:3, :3], tv) + pose[:3, 3]) * 100.0
        pts2, z = screen_vertices(v_cam, proj, CAM.width, CAM.height)
        return triangle_coefficients(pts2, z, ok)

    coefs, aux, cok = jax.vmap(setup_one)(
        jnp.asarray(bank.tri_verts[ids]), jnp.asarray(bank.tri_valid[ids]),
        jnp.asarray(poses))
    packed = pack_coefficients(coefs, aux, cok)
    anchors = compute_roi_anchors(jnp.asarray(poses), proj,
                                  CAM.width, CAM.height, 2, roi)
    keys = rasterize_keys_pallas(packed, width=CAM.width, height=CAM.height,
                                 stride=2, anchors=anchors, roi_shape=roi,
                                 interpret=True)
    from perception_tpu.ops.rasterizer import _INVALID_KEY, TRI_ID_BITS

    depth = np.where(np.asarray(keys) == _INVALID_KEY, 0,
                     np.asarray(keys) >> TRI_ID_BITS).reshape(-1, *roi)
    a = np.asarray(anchors)
    fd = np.asarray(full.depth)
    for i in range(len(poses)):
        x0, y0 = a[i]
        window = fd[i, y0:y0 + roi[0], x0:x0 + roi[1]]
        np.testing.assert_array_equal(depth[i] > 0, window > 0)
        dd = np.abs(depth[i].astype(np.int64) - window.astype(np.int64))
        assert dd.max() <= 1 and (dd > 0).mean() < 0.005


def test_render_roi_xla_matches_full_window():
    bank, poses = _setup()
    ids = np.zeros(len(poses), np.int32)
    proj = jnp.asarray(CAM.projection())
    roi = (40, 40)
    full = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        width=CAM.width, height=CAM.height, stride=2, tile=16, backend="xla")
    roi_out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        width=CAM.width, height=CAM.height, stride=2, tile=16, backend="xla",
        roi_shape=roi)
    a = np.asarray(roi_out.anchors)
    fd = np.asarray(full.depth)
    for i in range(len(poses)):
        x0, y0 = a[i]
        np.testing.assert_array_equal(
            np.asarray(roi_out.depth[i]), fd[i, y0:y0 + roi[0], x0:x0 + roi[1]])
        # ROI contains the whole object (all rendered pixels).
        assert (np.asarray(roi_out.depth[i]) > 0).sum() == (fd[i] > 0).sum()


def _setup_two_models(n_poses=6, seed=3):
    rng = np.random.default_rng(seed)
    v1, f1 = make_box(0.15, 0.12, 0.1)
    v2, f2 = make_box(0.08, 0.2, 0.06)
    bank = ModelBank.from_models(
        [mesh_model_from_arrays("a", v1, f1),
         mesh_model_from_arrays("b", v2, f2)], t_cap=16)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_poses, 1, 1))
    for i in range(n_poses):
        poses[i, :3, :3] = euler_xyz_to_matrix(*rng.uniform(-1, 1, 3))
        poses[i, :3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                           rng.uniform(0.6, 0.8)]
    ids = np.arange(n_poses, dtype=np.int32) % 2
    return bank, poses, ids


def test_direct_raster_matches_xla_full_frame():
    """Fully-fused kernel == xla path, mixed model ids, backface culling."""
    bank, poses, ids = _setup_two_models()
    proj = jnp.asarray(CAM.projection())
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2, tile=16,
                  bank_backface=jnp.asarray(bank.backface_cull))
    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="xla", **kwargs)
    out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="pallas_direct_interpret", **kwargs)
    assert (np.asarray(ref.depth) > 0).any()
    # The direct kernel resolves depth from the packed inverse-depth key
    # (w quantised by 2^-12 relative), so int-cm rounding may flip by one
    # unit on pixels within ~0.25 mm of a .5 cm boundary. Coverage and
    # triangle ids must match exactly.
    d_ref, d_out = np.asarray(ref.depth), np.asarray(out.depth)
    np.testing.assert_array_equal(d_out > 0, d_ref > 0)
    dd = np.abs(d_out.astype(np.int64) - d_ref.astype(np.int64))
    assert dd.max() <= 1 and (dd > 0).mean() < 0.005
    np.testing.assert_array_equal(np.asarray(out.tri_id),
                                  np.asarray(ref.tri_id))


def test_direct_raster_matches_xla_roi():
    bank, poses, ids = _setup_two_models(seed=5)
    proj = jnp.asarray(CAM.projection())
    roi = (24, 24)
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2, tile=16,
                  roi_shape=roi)
    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="xla", **kwargs)
    out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="pallas_direct_interpret", **kwargs)
    np.testing.assert_array_equal(np.asarray(out.anchors),
                                  np.asarray(ref.anchors))
    assert (np.asarray(ref.depth) > 0).any()
    # +/-1 unit on rounding-boundary pixels (see full-frame test above).
    d_ref, d_out = np.asarray(ref.depth), np.asarray(out.depth)
    np.testing.assert_array_equal(d_out > 0, d_ref > 0)
    dd = np.abs(d_out.astype(np.int64) - d_ref.astype(np.int64))
    assert dd.max() <= 1 and (dd > 0).mean() < 0.005


def test_direct_raster_sub_batch_parity(monkeypatch):
    """Batches beyond SUB_BATCH run the kernel per slice under lax.map
    (one pallas instance in the program, not n/SUB_BATCH unrolled copies);
    both the divisible lax.map path and the ragged-tail unrolled path must
    match the single-call result exactly."""
    from perception_tpu.ops import pallas_raster_direct as prd

    bank, poses, ids = _setup_two_models(n_poses=12, seed=7)
    proj = jnp.asarray(CAM.projection())
    v16 = prd.pack_bank_verts(
        bank.tri_verts, bank.tri_valid, jnp.asarray(bank.backface_cull))
    anchors = jnp.zeros((12, 2), jnp.int32)
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2,
                  interpret=True)

    # The outer wrapper is jitted and would cache across the SUB_BATCH
    # monkeypatch (identical shapes/statics), so drive the unjitted body.
    call = prd.rasterize_direct_pallas.__wrapped__
    ref = call(
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    monkeypatch.setattr(prd, "SUB_BATCH", 4)
    mapped = call(                              # 12 = 3 x 4: lax.map path
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    np.testing.assert_array_equal(np.asarray(mapped), np.asarray(ref))
    monkeypatch.setattr(prd, "SUB_BATCH", 5)
    ragged = call(                              # 12 = 5+5+2: unrolled path
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    np.testing.assert_array_equal(np.asarray(ragged), np.asarray(ref))


def test_direct_raster_sub_bbox_parity(monkeypatch):
    """PT_SUB_BBOX splits each triangle chunk into morton-local sub-slices
    with their own cull bboxes; the packed-max merge is associative, so the
    output must match the whole-chunk path EXACTLY (culling is conservative:
    a skipped sub-chunk cannot contain a covered pixel)."""
    from perception_tpu.ops import pallas_raster_direct as prd

    bank, poses, ids = _setup_two_models(n_poses=6, seed=11)
    proj = jnp.asarray(CAM.projection())
    v16 = prd.pack_bank_verts(
        bank.tri_verts, bank.tri_valid, jnp.asarray(bank.backface_cull))
    anchors = jnp.zeros((6, 2), jnp.int32)
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2,
                  interpret=True)
    call = prd.rasterize_direct_pallas.__wrapped__  # bypass the jit cache

    ref = call(
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    t = v16.shape[2]
    tri_chunk = min(prd.TRI_CHUNK, t)
    assert tri_chunk % 2 == 0, "test bank must split evenly"
    monkeypatch.setattr(prd, "SUB_BBOX", tri_chunk // 2)
    split = call(
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    np.testing.assert_array_equal(np.asarray(split), np.asarray(ref))
    # A non-dividing granularity falls back to whole-chunk bboxes.
    # tri_chunk - 1 never divides tri_chunk for tri_chunk > 2 (r4 advisor:
    # tri_chunk // 2 - 1 can accidentally divide it, e.g. 6 -> 3, silently
    # testing a valid split instead of the fallback).
    assert tri_chunk > 3
    monkeypatch.setattr(prd, "SUB_BBOX", tri_chunk - 1)
    fallback = call(
        v16, jnp.asarray(poses), jnp.asarray(ids), anchors, proj, **kwargs)
    np.testing.assert_array_equal(np.asarray(fallback), np.asarray(ref))


def test_pallas_knn_interpret_matches_xla(rng):
    n, p, s = 2, 40, 70
    q = rng.normal(size=(n, p, 3)).astype(np.float32)
    r = rng.normal(size=(n, s, 3)).astype(np.float32)
    rv = rng.random((n, s)) > 0.3
    qv = jnp.ones((n, p), bool)
    d_ref, i_ref = nn1_batch(jnp.asarray(q), qv, jnp.asarray(r),
                             jnp.asarray(rv), ref_tile=32)
    d, i = nn1_batch_pallas(jnp.asarray(q), qv, jnp.asarray(r),
                            jnp.asarray(rv), interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-5)


def test_fused_icp_interpret_converges(rng):
    """Grouped fused ICP kernel (interpret mode): recovers a known rigid
    offset on a synthetic surface, matches the composed NN-ICP delta, and
    handles group padding (N not a multiple of _GROUP)."""
    from perception_tpu.ops.icp import icp_point_to_plane_batch
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 5, 64, 128   # 5 poses -> padded to 8 (group of 4 x 2)
    # Smooth height-field surface with analytic normals.
    gx = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gy = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gz = (0.6 + 0.2 * gx + 0.1 * gy).astype(np.float32)
    tgt = np.stack([gx, gy, gz], axis=-1)
    nrm = np.tile(np.asarray([-0.2, -0.1, 1.0], np.float32) / np.sqrt(1.05),
                  (n, s, 1))
    tv = np.ones((n, s), bool)
    # Source: subset of the surface shifted by a known offset.
    true_shift = np.asarray([0.004, -0.003, 0.008], np.float32)
    src = tgt[:, :p] - true_shift
    sv = np.ones((n, p), bool)

    delta = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv),
        pack_targets(jnp.asarray(tgt), jnp.asarray(tv), jnp.asarray(nrm)),
        max_iterations=15, max_correspondence=0.05, interpret=True))
    # The plane normal constrains the shift along n only for this surface;
    # check the residual along n is removed.
    for i in range(n):
        t_est = delta[i, :3, 3]
        resid = np.dot(nrm[0, 0], true_shift - t_est)
        assert abs(resid) < 5e-4, (i, t_est, resid)

    ref = icp_point_to_plane_batch(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt),
        jnp.asarray(tv), jnp.asarray(nrm),
        max_iterations=15, max_correspondence=0.05, crop_k=0)
    ref_t = np.asarray(ref.delta)[:, :3, 3]
    for i in range(n):
        r_ref = np.dot(nrm[0, 0], true_shift - ref_t[i])
        assert abs(r_ref) < 5e-4
        # Both solvers agree along the constrained direction.
        assert abs(np.dot(nrm[0, 0], delta[i, :3, 3] - ref_t[i])) < 1e-3


def test_fused_icp_group_size_is_pure_scheduling(rng):
    """Group size is a pure scheduling knob: per-pose freeze masks make the
    results bit-identical across G (pallas_icp.py docstring), which is what
    lets PT_ICP_GROUP=8 ship as a perf default without ladder pricing
    (on-chip: 13.4 vs 16.5 ms/2048-pose batch at the bench shapes). Uses
    per-pose problems of very different difficulty plus a tight stagnation
    streak so early exit actually fires at different iterations within a
    group."""
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 8, 64, 128
    gx = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gy = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gz = (0.6 + 0.2 * gx + 0.1 * gy + 0.05 * np.sin(20 * gx)).astype(
        np.float32)
    tgt = np.stack([gx, gy, gz], axis=-1)
    nz = np.stack([0.2 + np.cos(20 * gx), 0.1 * np.ones_like(gx),
                   np.ones_like(gx)], axis=-1)
    nrm = (nz / np.linalg.norm(nz, axis=-1, keepdims=True)).astype(
        np.float32)
    tv = np.ones((n, s), bool)
    # Per-pose offsets spanning 0 (instant convergence) to large (runs the
    # full budget): group members exit at different iterations.
    scale = np.linspace(0.0, 0.03, n, dtype=np.float32)[:, None]
    src = tgt[:, :p] - scale[:, :, None] * np.asarray(
        [0.4, -0.3, 0.8], np.float32)
    sv = np.ones((n, p), bool)
    packed = pack_targets(jnp.asarray(tgt), jnp.asarray(tv),
                          jnp.asarray(nrm))

    kw = dict(max_iterations=12, max_correspondence=0.05,
              stagnation_streak=2.0, nn_every=2, interpret=True)
    d4 = np.asarray(icp_fused_pallas(jnp.asarray(src), jnp.asarray(sv),
                                     packed, group=4, **kw))
    d8 = np.asarray(icp_fused_pallas(jnp.asarray(src), jnp.asarray(sv),
                                     packed, group=8, **kw))
    np.testing.assert_array_equal(d4, d8)


def test_gather_rows_onehot_is_bit_exact(rng):
    """gather_rows_onehot (the MXU replacement for the scorer's cropped
    packed-target gather) reproduces take_along_axis BIT-EXACTLY for f32
    inputs — the 3-way bf16 significand split covers all 24 bits —
    including the 1e30 invalid-additive sentinel pack_targets emits."""
    from perception_tpu.ops.pallas_icp import gather_rows_onehot

    n, s, k, a = 7, 96, 33, 8
    tile = rng.normal(0, 1.0, (n, s, a)).astype(np.float32)
    tile[:, :, 7] = np.where(rng.uniform(size=(n, s)) < 0.3, 1e30, 0.0)
    # Mix in extreme exponents (tiny coords, big n.t) to stress the split.
    tile[:, ::5, 2] *= 1e-6
    tile[:, ::7, 6] *= 1e4
    idx = rng.integers(0, s, (n, k)).astype(np.int32)

    got = np.asarray(gather_rows_onehot(jnp.asarray(tile), jnp.asarray(idx)))
    ref = np.take_along_axis(tile, idx[..., None], axis=1)
    np.testing.assert_array_equal(got, ref)


def test_fused_icp_adaptive_association_degenerate_cases(rng):
    """nn_every=0 (adaptive association, pallas_icp.py): trigger=0 forces a
    re-association every iteration (== nn_every=1 bit-exact) and a huge
    trigger never re-associates after k=0 (== nn_every=max_iterations
    bit-exact), so the adaptive mode's entire behavior space is bracketed
    by the fixed-period modes it interpolates between."""
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 8, 64, 128
    gx = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gy = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gz = (0.6 + 0.2 * gx + 0.1 * gy + 0.05 * np.sin(20 * gx)).astype(
        np.float32)
    tgt = np.stack([gx, gy, gz], axis=-1)
    nz = np.stack([0.2 + np.cos(20 * gx), 0.1 * np.ones_like(gx),
                   np.ones_like(gx)], axis=-1)
    nrm = (nz / np.linalg.norm(nz, axis=-1, keepdims=True)).astype(
        np.float32)
    tv = np.ones((n, s), bool)
    scale = np.linspace(0.0, 0.03, n, dtype=np.float32)[:, None]
    src = tgt[:, :p] - scale[:, :, None] * np.asarray(
        [0.4, -0.3, 0.8], np.float32)
    sv = np.ones((n, p), bool)
    packed = pack_targets(jnp.asarray(tgt), jnp.asarray(tv),
                          jnp.asarray(nrm))
    kw = dict(max_iterations=12, max_correspondence=0.05,
              stagnation_streak=3.0, interpret=True)

    every = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv), packed, nn_every=1, **kw))
    adaptive0 = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv), packed, nn_every=0,
        assoc_trigger=0.0, **kw))
    np.testing.assert_array_equal(adaptive0, every)

    once = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv), packed, nn_every=12, **kw))
    adaptive_inf = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv), packed, nn_every=0,
        assoc_trigger=1e9, **kw))
    np.testing.assert_array_equal(adaptive_inf, once)

    # A realistic trigger recovers a known rigid shift as well as
    # per-iteration association does (plane-constrained direction).
    adaptive = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv), packed, nn_every=0,
        assoc_trigger=0.004, **kw))
    true_dirs = scale * np.asarray([0.4, -0.3, 0.8], np.float32)
    for i in range(n):
        r_ad = np.dot(nrm[i, 0], true_dirs[i] - adaptive[i, :3, 3])
        r_ev = np.dot(nrm[i, 0], true_dirs[i] - every[i, :3, 3])
        assert abs(r_ad) <= abs(r_ev) + 1e-3, (i, r_ad, r_ev)


def test_scorer_roi_matches_full(monkeypatch):
    """End-to-end: ROI-mode scores equal full-frame scores when the window
    covers the object."""
    import dataclasses

    from tests.test_pipeline import gt_states, make_env
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    env = make_env()
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    rng = np.random.default_rng(5)
    cands = []
    for obj in gt:
        for _ in range(4):
            j = rng.normal(0, 0.015, 3)
            p = ContPose.from_quat(obj.pose.x + j[0], obj.pose.y + j[1],
                                   obj.pose.z + j[2], *obj.pose.quaternion())
            cands.append(ObjectState(id=obj.id, symmetric=False, pose=p,
                                     segmentation_label_id=obj.segmentation_label_id))
    ref = env.score_object_states(cands, do_icp=False)
    env.env = dataclasses.replace(env.env, roi_size=40)
    roi = env.score_object_states(cands, do_icp=False)
    for a, b in zip(ref, roi):
        assert a.cost == b.cost, (a, b)
        assert a.target_cost == b.target_cost


def test_projective_icp_converges():
    """Projective ICP improves an offset pose on the synthetic scene (looser
    tolerance than NN mode: no tangential signal on flat faces)."""
    import dataclasses

    from tests.test_pipeline import gt_states, make_env
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    env = make_env()
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    env.env = dataclasses.replace(env.env, icp_mode="projective")
    off = ContPose.from_quat(gt[0].pose.x + 0.005, gt[0].pose.y - 0.004,
                             gt[0].pose.z + 0.012, 0, 0, 0, 1)
    cand = ObjectState(id=0, symmetric=False, pose=off, segmentation_label_id=1)
    scored = env.score_object_states([cand], do_icp=True)
    adj = env.camera_to_world_pose(scored[0].adjusted_pose_cam, 0)
    err = np.linalg.norm(np.array([adj.x, adj.y, adj.z])
                         - np.array([gt[0].pose.x, gt[0].pose.y, gt[0].pose.z]))
    init = np.linalg.norm([0.005, 0.004, 0.012])
    assert err < init, f"projective ICP made it worse: {err} vs {init}"


def test_fused_cost_matches_composed(rng):
    from perception_tpu.ops.cost import compute_costs, compute_costs_fused
    from perception_tpu.ops.pallas_cost import nn_cost_fused_pallas

    n, p, s = 3, 40, 72
    cloud = rng.normal(0, 0.05, (n, p, 3)).astype(np.float32)
    cloud[..., 2] += 0.6
    cvalid = rng.random((n, p)) > 0.25
    tgt = rng.normal(0, 0.05, (n, s, 3)).astype(np.float32)
    tgt[..., 2] += 0.6
    tvalid = rng.random((n, s)) > 0.25
    occl = np.array([0, 1, 0], np.int32)
    totals = np.full(n, 50.0, np.float32)

    pn, ue, ex = nn_cost_fused_pallas(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(tgt),
        jnp.asarray(tvalid), sensor_resolution=0.03, interpret=True)

    # Composed reference.
    from perception_tpu.ops.knn import nn1_batch

    d, i = nn1_batch(jnp.asarray(cloud), jnp.asarray(cvalid),
                     jnp.asarray(tgt), jnp.asarray(tvalid), ref_tile=24)
    ref = compute_costs(d, i, jnp.asarray(cvalid),
                        jnp.zeros(n, jnp.int32),
                        jnp.zeros((n, p, 3)), jnp.zeros((n, s, 3)),
                        jnp.asarray(totals), sensor_resolution=0.03)
    np.testing.assert_allclose(np.asarray(pn), np.asarray(ref.pose_point_num))
    np.testing.assert_allclose(np.asarray(ex),
                               np.asarray(ref.observed_explained))
    # Full wrapper with occlusion sentinels.
    out = compute_costs_fused(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(occl),
        jnp.asarray(tgt), jnp.asarray(tvalid), jnp.asarray(totals),
        sensor_resolution=0.03, interpret=True)
    assert float(out.rendered_cost[1]) == -1.0
    np.testing.assert_allclose(np.asarray(out.rendered_cost[0]),
                               np.asarray(ref.rendered_cost[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.observed_cost[2]),
                               np.asarray(ref.observed_cost[2]), rtol=1e-6)


def test_bin_raster_matches_direct():
    """Scatter-bin kernel == direct kernel bit-for-bit (same packed-key
    epilogue); kept as the measured record of the round-3 prepass
    experiment (see ARCHITECTURE.md roofline)."""
    bank, poses, ids = _setup_two_models(seed=7)
    proj = jnp.asarray(CAM.projection())
    for roi in (None, (24, 24)):
        kwargs = dict(width=CAM.width, height=CAM.height, stride=2, tile=16,
                      roi_shape=roi,
                      bank_backface=jnp.asarray(bank.backface_cull))
        ref = render_pose_batch(
            bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids,
            proj, backend="pallas_direct_interpret", **kwargs)
        out = render_pose_batch(
            bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids,
            proj, backend="pallas_bin_interpret", **kwargs)
        np.testing.assert_array_equal(np.asarray(out.depth),
                                      np.asarray(ref.depth))
        np.testing.assert_array_equal(np.asarray(out.tri_id),
                                      np.asarray(ref.tri_id))


def test_lod_bank_renders_same_sampled_surface():
    """ModelBank.decimated: at coarse sample spacing the LOD render's
    depth must stay within sensor tolerance of the full bank's wherever
    both cover, with nearly identical coverage."""
    from scipy.spatial import ConvexHull

    from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(400, 3))
    pts = 0.06 * pts / np.linalg.norm(pts, axis=1, keepdims=True)
    hull = ConvexHull(pts)
    m = mesh_model_from_arrays("blob", pts, hull.simplices,
                               colors=np.tile([150.0, 90, 60], (400, 1)))
    bank = ModelBank.from_models([m], t_cap=len(hull.simplices))
    poses = np.stack([np.eye(4, dtype=np.float32)])
    poses[0][:3, 3] = [0.0, 0.0, 0.6]
    ids = np.zeros(1, np.int32)
    lod = bank.decimated(bank.tri_valid.shape[1] // 4)
    assert lod.tri_valid.shape[1] <= bank.tri_valid.shape[1] // 2
    proj = jnp.asarray(CAM.projection())
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2, tile=16)
    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="xla", **kwargs)
    out = render_pose_batch(
        lod.tri_verts, lod.tri_colors, lod.tri_valid, poses, ids, proj,
        backend="xla", **kwargs)
    d_ref = np.asarray(ref.depth).astype(np.int64)
    d_out = np.asarray(out.depth).astype(np.int64)
    both = (d_ref > 0) & (d_out > 0)
    assert both.sum() > 50
    # Coverage deviates only at silhouettes; depth within 2 cm on overlap.
    cov_flip = ((d_ref > 0) != (d_out > 0)).mean()
    assert cov_flip < 0.05, cov_flip
    assert np.abs(d_ref[both] - d_out[both]).max() <= 3


def test_fused_color_cost_matches_composed(rng):
    """Colour-gated fused kernel (types 1/3) == composed CIEDE2000 path."""
    from perception_tpu.ops.cost import COST_TYPE_6DOF_RGB, compute_costs, compute_costs_fused
    from perception_tpu.ops.knn import nn1_batch

    n, p, s = 4, 48, 80
    cloud = rng.normal(0, 0.05, (n, p, 3)).astype(np.float32)
    cloud[..., 2] += 0.6
    cvalid = rng.random((n, p)) > 0.25
    tgt = rng.normal(0, 0.05, (n, s, 3)).astype(np.float32)
    tgt[..., 2] += 0.6
    tvalid = rng.random((n, s)) > 0.25
    crgb = rng.uniform(0, 255, (n, p, 3)).astype(np.float32)
    trgb = rng.uniform(0, 255, (n, s, 3)).astype(np.float32)
    # Half the rendered points copy their nearest target's colour so the
    # gate passes sometimes (pure random colours almost always fail it).
    d, i = nn1_batch(jnp.asarray(cloud), jnp.asarray(cvalid),
                     jnp.asarray(tgt), jnp.asarray(tvalid), ref_tile=16)
    nn_rgb = np.take_along_axis(trgb, np.asarray(i)[..., None], axis=1)
    copy = rng.random((n, p)) > 0.5
    crgb[copy] = nn_rgb[copy] + rng.normal(0, 3, (int(copy.sum()), 3))
    occl = np.zeros(n, np.int32)
    totals = np.full(n, 60.0, np.float32)

    ref = compute_costs(d, i, jnp.asarray(cvalid), jnp.asarray(occl),
                        jnp.asarray(crgb), jnp.asarray(trgb),
                        jnp.asarray(totals), sensor_resolution=0.03,
                        color_distance_threshold=18.0,
                        cost_type=COST_TYPE_6DOF_RGB)
    from perception_tpu.ops.color import rgb_to_lab

    out = compute_costs_fused(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(occl),
        jnp.asarray(tgt), jnp.asarray(tvalid), jnp.asarray(totals),
        sensor_resolution=0.03, interpret=True,
        cloud_lab=rgb_to_lab(jnp.asarray(crgb)),
        tgt_lab=rgb_to_lab(jnp.asarray(trgb)),
        color_distance_threshold=18.0, use_color=True)
    np.testing.assert_allclose(np.asarray(out.pose_point_num),
                               np.asarray(ref.pose_point_num))
    np.testing.assert_allclose(np.asarray(out.rendered_cost),
                               np.asarray(ref.rendered_cost), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.observed_cost),
                               np.asarray(ref.observed_cost), atol=1e-4)


def test_fused_color_tri_kernel_matches_lab_kernel(rng):
    """Tri-mode fused colour cost (in-kernel bank Lab recovery via the
    winning face id) == the Lab-channel fused kernel given the same
    effective per-point colours."""
    from perception_tpu.ops.pallas_cost import (
        nn_cost_fused_color_pallas,
        nn_cost_fused_color_tri_pallas,
        pack_bank_lab,
    )

    n, p, s, m, t = 4, 48, 80, 2, 24
    cloud = rng.normal(0, 0.05, (n, p, 3)).astype(np.float32)
    cloud[..., 2] += 0.6
    cvalid = rng.random((n, p)) > 0.25
    tgt = rng.normal(0, 0.05, (n, s, 3)).astype(np.float32)
    tgt[..., 2] += 0.6
    tvalid = rng.random((n, s)) > 0.25
    tgt_lab = rng.uniform(0, 100, (n, s, 3)).astype(np.float32)
    bank_lab = rng.uniform(0, 100, (m, t, 3)).astype(np.float32)
    tri_id = rng.integers(0, t, (n, p)).astype(np.int32)
    tri_id[~cvalid] = -1
    model_ids = (np.arange(n) % m).astype(np.int32)

    out_tri = nn_cost_fused_color_tri_pallas(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(tri_id),
        jnp.asarray(model_ids), pack_bank_lab(jnp.asarray(bank_lab)),
        jnp.asarray(tgt), jnp.asarray(tvalid), jnp.asarray(tgt_lab),
        sensor_resolution=0.03, color_distance_threshold=18.0,
        interpret=True)
    cloud_lab = bank_lab[model_ids[:, None], np.maximum(tri_id, 0)]
    out_lab = nn_cost_fused_color_pallas(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(cloud_lab),
        jnp.asarray(tgt), jnp.asarray(tvalid), jnp.asarray(tgt_lab),
        sensor_resolution=0.03, color_distance_threshold=18.0,
        interpret=True)
    for a, b in zip(out_tri, out_lab):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fused_icp_d2d_interpret_recovers_full_offset(rng):
    """d2d_epsilon > 0 (GICP weighting in the fused kernel): the
    point-to-point half constrains the tangential directions a planar
    point-to-plane cost leaves free, so the FULL rigid shift is
    recovered (not just its normal component), and the centred rotation
    handles a large initial rotation the origin-centred p2p solve
    cannot (pallas_icp.py _icp_kernel docstring)."""
    from perception_tpu.core.pose import euler_xyz_to_matrix
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 2, 128, 256
    # Curved surface (quadratic bowl) with analytic normals: tangential
    # error is observable, unlike a plane.
    uv = rng.uniform(-0.08, 0.08, (s, 2)).astype(np.float32)
    z = 0.6 + 1.2 * (uv[:, 0] ** 2 + 0.6 * uv[:, 1] ** 2)
    tgt1 = np.c_[uv, z].astype(np.float32)
    nrm1 = np.c_[-2.4 * uv[:, 0], -1.44 * uv[:, 1], np.ones(s)]
    nrm1 = (nrm1 / np.linalg.norm(nrm1, axis=1, keepdims=True)).astype(
        np.float32)
    sel = rng.choice(s, p, replace=False)

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = euler_xyz_to_matrix(0.25, -0.2, 0.15)
    T[:3, 3] = [0.03, 0.02, -0.02]
    src1 = (tgt1[sel] @ T[:3, :3].T + T[:3, 3]).astype(np.float32)

    tgt = np.tile(tgt1[None], (n, 1, 1))
    nrm = np.tile(nrm1[None], (n, 1, 1))
    src = np.tile(src1[None], (n, 1, 1))
    ones_t = np.ones((n, s), bool)
    ones_s = np.ones((n, p), bool)

    delta = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(ones_s),
        pack_targets(jnp.asarray(tgt), jnp.asarray(ones_t),
                     jnp.asarray(nrm)),
        max_iterations=60, max_correspondence=0.05,
        d2d_epsilon=0.05, interpret=True))
    for i in range(n):
        resid = delta[i] @ T
        t_err = np.linalg.norm(resid[:3, 3])
        assert t_err < 1e-3, (i, t_err)


def test_fused_icp_d2d_exact_matches_icp_gicp_batch(rng):
    """exact=True runs icp_gicp_batch's full 3x3 Mahalanobis GN inside
    the fused kernel (same weight matrix, centred jacobian, Marquardt
    damping) — the deltas must agree to float tolerance, pose by pose,
    including the partially-invalid case."""
    from perception_tpu.core.pose import euler_xyz_to_matrix
    from perception_tpu.ops.icp import icp_gicp_batch
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 3, 128, 256
    uv = rng.uniform(-0.08, 0.08, (s, 2)).astype(np.float32)
    z = 0.6 + 1.2 * (uv[:, 0] ** 2 + 0.6 * uv[:, 1] ** 2)
    tgt1 = np.c_[uv, z].astype(np.float32)
    nrm1 = np.c_[-2.4 * uv[:, 0], -1.44 * uv[:, 1], np.ones(s)]
    nrm1 = (nrm1 / np.linalg.norm(nrm1, axis=1, keepdims=True)).astype(
        np.float32)

    src = np.zeros((n, p, 3), np.float32)
    snrm = np.zeros((n, p, 3), np.float32)
    svalid = np.ones((n, p), bool)
    for i in range(n):
        sel = rng.choice(s, p, replace=False)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = euler_xyz_to_matrix(*rng.uniform(-0.15, 0.15, 3))
        T[:3, 3] = rng.uniform(-0.02, 0.02, 3)
        src[i] = tgt1[sel] @ T[:3, :3].T + T[:3, 3]
        snrm[i] = nrm1[sel] @ T[:3, :3].T
    svalid[1, 64:] = False            # partially-invalid pose
    tgt = np.tile(tgt1[None], (n, 1, 1))
    nrm = np.tile(nrm1[None], (n, 1, 1))
    tvalid = np.ones((n, s), bool)

    delta = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(svalid),
        pack_targets(jnp.asarray(tgt), jnp.asarray(tvalid),
                     jnp.asarray(nrm)),
        jnp.asarray(snrm),
        max_iterations=40, max_correspondence=0.05,
        rotation_epsilon=2e-4, transformation_epsilon=5e-5,
        d2d_epsilon=0.05, exact=True, interpret=True))
    ref = icp_gicp_batch(
        jnp.asarray(src), jnp.asarray(svalid), jnp.asarray(snrm),
        jnp.asarray(tgt), jnp.asarray(tvalid), jnp.asarray(nrm),
        max_iterations=40, max_correspondence=0.05, gicp_epsilon=0.05)
    np.testing.assert_allclose(delta, np.asarray(ref.delta), atol=2e-4)


def test_fused_icp_exact_requires_normals():
    import pytest

    from perception_tpu.ops.pallas_icp import icp_fused_pallas

    with pytest.raises(ValueError):
        icp_fused_pallas(
            jnp.zeros((1, 8, 3)), jnp.ones((1, 8), bool),
            jnp.zeros((1, 8, 8)), d2d_epsilon=0.05, exact=True,
            interpret=True)
