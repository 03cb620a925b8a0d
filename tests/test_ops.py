"""Unit tests for point-cloud, KNN, cost, colour, and ICP ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from perception_tpu.ops.cost import COST_TYPE_3DOF_RGBD, COST_TYPE_6DOF, compute_costs
from perception_tpu.ops.icp import (
    cloud_normals,
    icp_point_to_plane_batch,
    se3_exp,
    smallest_eigenvector_3x3,
    so3_exp,
)
from perception_tpu.ops.knn import knn_self, nn1_batch
from perception_tpu.ops.color import ciede2000, rgb_to_lab
from perception_tpu.ops.pointcloud import depth_to_cloud_batch, observed_cloud_from_depth


def test_depth_to_cloud_unprojection():
    # Single pose, one valid pixel with known depth.
    h, w, stride = 4, 6, 2
    width, height = w * stride, h * stride
    depth = np.zeros((1, h, w), np.int32)
    depth[0, 2, 3] = 150  # cm -> 1.5 m; full-res pixel (x=6, y=4)
    color = np.zeros((1, h, w, 3), np.float32)
    color[0, 2, 3] = [10, 20, 30]
    out = depth_to_cloud_batch(
        jnp.asarray(depth), jnp.asarray(color),
        fx=100.0, fy=100.0, cx=6.0, cy=4.0,
        width=width, height=height, stride=stride,
        depth_factor=100.0, max_points=8)
    assert int(out.count[0]) == 1
    assert bool(out.valid[0, 0])
    np.testing.assert_allclose(
        np.asarray(out.xyz[0, 0]), [0.0, 0.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rgb[0, 0]), [10, 20, 30])
    # Off-centre pixel: (x=0,y=0) -> x = (0-6)/100*z.
    depth[0, 0, 0] = 100
    out = depth_to_cloud_batch(
        jnp.asarray(depth), jnp.asarray(color),
        fx=100.0, fy=100.0, cx=6.0, cy=4.0,
        width=width, height=height, stride=stride,
        depth_factor=100.0, max_points=8)
    assert int(out.count[0]) == 2
    np.testing.assert_allclose(
        np.asarray(out.xyz[0, 0]), [-0.06, -0.04, 1.0], atol=1e-6)


def test_depth_to_cloud_compaction_order_and_cap():
    depth = np.zeros((1, 2, 4), np.int32)
    depth[0, 0, 1] = 100
    depth[0, 1, 0] = 200
    depth[0, 1, 3] = 300
    color = np.zeros((1, 2, 4, 3), np.float32)
    out = depth_to_cloud_batch(
        jnp.asarray(depth), jnp.asarray(color),
        fx=100.0, fy=100.0, cx=2.0, cy=1.0, width=4, height=2, stride=1,
        depth_factor=100.0, max_points=2)
    # Scan order: pixel 1 (d=100) then pixel 4 (d=200); third dropped by cap.
    assert np.asarray(out.valid[0]).tolist() == [True, True]
    np.testing.assert_allclose(np.asarray(out.xyz[0, :, 2]), [1.0, 2.0])
    assert int(out.count[0]) == 3  # count reports all valid pre-cap


def test_observed_cloud_label_partition():
    h = w = 8
    depth = np.full((h, w), 1000, np.float32)   # sensor units
    label = np.zeros((h, w), np.int32)
    label[:4] = 1
    label[4:] = 2
    color = np.zeros((h, w, 3), np.float32)
    out = observed_cloud_from_depth(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(label),
        fx=100.0, fy=100.0, cx=4.0, cy=4.0, width=w, height=h, stride=2,
        depth_factor=1000.0, max_points=32, seg_cap=16, num_labels=4)
    assert int(out.count) == 16  # 4x4 strided, all labelled
    counts = np.asarray(out.seg_count)
    assert counts[0] == 8 and counts[1] == 8 and counts[2] == 0
    # Segment points carry the right z.
    assert np.allclose(np.asarray(out.seg_xyz[0])[np.asarray(out.seg_valid[0]), 2], 1.0)


def test_observed_cloud_bounds_filter():
    h = w = 4
    depth = np.full((h, w), 100, np.float32)
    label = np.ones((h, w), np.int32)
    color = np.zeros((h, w, 3), np.float32)
    bounds = jnp.asarray([0.015, -0.015, 10.0, -10.0, 10.0, -10.0])  # tight x
    out = observed_cloud_from_depth(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(label),
        fx=100.0, fy=100.0, cx=2.0, cy=2.0, width=w, height=h, stride=1,
        depth_factor=100.0, max_points=16, seg_cap=16, num_labels=2,
        use_label_filter=False, use_bounds_filter=True, bounds=bounds,
        cam_to_world=jnp.eye(4))
    xs = np.asarray(out.xyz)[np.asarray(out.valid), 0]
    assert (np.abs(xs) <= 0.015 + 1e-9).all()
    assert int(out.count) == 12  # columns x_pcd in {-0.01, 0, 0.01} pass


def test_nn1_matches_bruteforce(rng):
    q = rng.normal(size=(3, 20, 3)).astype(np.float32)
    r = rng.normal(size=(3, 33, 3)).astype(np.float32)
    rv = rng.random((3, 33)) > 0.3
    d, i = nn1_batch(jnp.asarray(q), jnp.ones((3, 20), bool),
                     jnp.asarray(r), jnp.asarray(rv), ref_tile=8)
    for n in range(3):
        dist = ((q[n][:, None] - r[n][None]) ** 2).sum(-1)
        dist[:, ~rv[n]] = np.inf
        np.testing.assert_allclose(np.asarray(d[n]), dist.min(1), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i[n]), dist.argmin(1))


def test_knn_self_excludes_self(rng):
    x = rng.normal(size=(2, 12, 3)).astype(np.float32)
    d, i = knn_self(jnp.asarray(x), jnp.ones((2, 12), bool), k=3)
    assert (np.asarray(i) != np.arange(12)[None, :, None]).all()
    # First neighbour really is the nearest non-self point.
    for b in range(2):
        dist = ((x[b][:, None] - x[b][None]) ** 2).sum(-1)
        np.fill_diagonal(dist, np.inf)
        np.testing.assert_allclose(np.asarray(d[b, :, 0]), dist.min(1), rtol=1e-5)


def test_cost_semantics_basic():
    # 2 poses, 3 rendered points each, 4 observed points.
    knn_d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]]) ** 2
    knn_i = jnp.asarray([[0, 1, 2], [0, 0, 1]], jnp.int32)
    valid = jnp.asarray([[True, True, True], [True, True, False]])
    occl = jnp.zeros(2, jnp.int32)
    rgb = jnp.zeros((2, 3, 3))
    orgb = jnp.zeros((2, 4, 3))
    total = jnp.asarray([4.0, 4.0])
    out = compute_costs(knn_d, knn_i, valid, occl, rgb, orgb, total,
                        sensor_resolution=0.01, cost_type=COST_TYPE_6DOF)
    # Pose 0: 1 of 3 points unexplained -> 33.33%; explained obs {0, 2} -> 2.
    assert np.isclose(float(out.rendered_cost[0]), 100.0 / 3.0)
    assert np.isclose(float(out.observed_explained[0]), 2.0)
    assert np.isclose(float(out.observed_cost[0]), 50.0)
    assert np.isclose(float(out.points_diff_cost[0]), 0.0)
    # Pose 1: 2 valid points, both explained, both marking obs 0 -> 1 explained.
    assert np.isclose(float(out.rendered_cost[1]), 0.0)
    assert np.isclose(float(out.observed_cost[1]), 75.0)
    assert np.isclose(float(out.points_diff_cost[1]), 1.0)


def test_cost_sentinels():
    knn_d = jnp.zeros((2, 3))
    knn_i = jnp.zeros((2, 3), jnp.int32)
    valid = jnp.asarray([[False, False, False], [True, True, True]])
    occl = jnp.asarray([0, 1], jnp.int32)
    out = compute_costs(knn_d, knn_i, valid, occl,
                        jnp.zeros((2, 3, 3)), jnp.zeros((2, 4, 3)),
                        jnp.asarray([4.0, 4.0]),
                        sensor_resolution=0.01)
    assert float(out.rendered_cost[0]) == -1.0  # no points
    assert float(out.rendered_cost[1]) == -1.0  # occluded


def test_cost_color_type(rng):
    # Matching position but mismatched colour counts as unexplained in RGBD.
    knn_d = jnp.zeros((1, 2))
    knn_i = jnp.asarray([[0, 1]], jnp.int32)
    valid = jnp.ones((1, 2), bool)
    rgb = jnp.asarray([[[255.0, 0, 0], [10, 10, 10]]])
    orgb = jnp.asarray([[[0, 255.0, 0], [10, 10, 10]]])
    out = compute_costs(knn_d, knn_i, valid, jnp.zeros(1, jnp.int32),
                        rgb, orgb, jnp.asarray([2.0]),
                        sensor_resolution=0.01,
                        color_distance_threshold=15.0,
                        cost_type=COST_TYPE_3DOF_RGBD)
    assert np.isclose(float(out.rendered_cost[0]), 50.0)
    assert np.isclose(float(out.observed_explained[0]), 1.0)


def test_rgb_lab_known_values():
    lab = np.asarray(rgb_to_lab(jnp.asarray([[255.0, 255.0, 255.0],
                                             [0.0, 0.0, 0.0],
                                             [255.0, 0.0, 0.0]])))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.01)
    # sRGB red in Lab (D65): ~ (53.24, 80.09, 67.20).
    np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.1)


def test_ciede2000_sanity():
    lab_a = rgb_to_lab(jnp.asarray([[50.0, 100.0, 200.0]]))
    assert float(ciede2000(lab_a, lab_a)[0]) < 1e-3
    lab_b = rgb_to_lab(jnp.asarray([[200.0, 100.0, 50.0]]))
    assert float(ciede2000(lab_a, lab_b)[0]) > 20.0


def test_smallest_eigenvector(rng):
    # Build covariances with known smallest eigenvector.
    for _ in range(5):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        evals = np.sort(rng.random(3) + 0.1)[::-1]
        evals[2] = 0.001
        cov = q @ np.diag(evals) @ q.T
        v = np.asarray(smallest_eigenvector_3x3(jnp.asarray(cov[None]))[0])
        target = q[:, 2]
        assert abs(abs(v @ target) - 1.0) < 1e-3


def test_cloud_normals_plane(rng):
    # Points on the z=1 plane -> normals along -z (towards camera).
    pts = np.zeros((1, 64, 3), np.float32)
    pts[0, :, 0] = rng.random(64)
    pts[0, :, 1] = rng.random(64)
    pts[0, :, 2] = 1.0
    n = np.asarray(cloud_normals(jnp.asarray(pts), jnp.ones((1, 64), bool), k=8))
    # Points whose k-NN neighbourhood is near-collinear have an ill-defined
    # in-plane eigen-gap; 0.95 is ample accuracy for point-to-plane ICP.
    assert np.allclose(np.abs(n[0, :, 2]), 1.0, atol=0.05)
    assert np.median(np.abs(n[0, :, 2])) > 0.999
    assert (n[0, :, 2] < 0).all()  # oriented towards origin


def test_se3_exp_identity():
    assert np.allclose(np.asarray(se3_exp(jnp.zeros((1, 6)))[0]), np.eye(4), atol=1e-7)
    rot = np.asarray(so3_exp(jnp.asarray([[0, 0, np.pi / 2]]))[0])
    assert np.allclose(rot @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_icp_recovers_perturbation(rng):
    # Target: jittered grid on a wavy surface; source: transformed copy.
    gx, gy = np.meshgrid(np.linspace(-0.1, 0.1, 16), np.linspace(-0.1, 0.1, 16))
    gz = 1.0 + 0.05 * np.sin(gx * 40) + 0.03 * np.cos(gy * 30)
    tgt = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1).astype(np.float32)

    from perception_tpu.core.pose import euler_xyz_to_matrix
    true_rot = euler_xyz_to_matrix(0.04, -0.03, 0.05)
    true_t = np.array([0.01, -0.008, 0.012])
    src = (tgt - true_t) @ true_rot  # inverse-transform: delta @ src ~ tgt

    n_batch = 3
    src_b = np.tile(src[None], (n_batch, 1, 1)).astype(np.float32)
    tgt_b = np.tile(tgt[None], (n_batch, 1, 1)).astype(np.float32)
    ones = np.ones((n_batch, len(tgt)), bool)
    normals = cloud_normals(jnp.asarray(tgt_b), jnp.asarray(ones), k=8)
    res = icp_point_to_plane_batch(
        jnp.asarray(src_b), jnp.asarray(ones),
        jnp.asarray(tgt_b), jnp.asarray(ones), normals,
        max_iterations=30, max_correspondence=0.1, ref_tile=256)
    delta = np.asarray(res.delta)
    for b in range(n_batch):
        moved = src @ delta[b, :3, :3].T + delta[b, :3, 3]
        err = np.linalg.norm(moved - tgt, axis=1).mean()
        assert err < 2e-3, f"batch {b}: residual {err}"
    assert float(res.rmse[0]) < 2e-3


def test_gicp_recovers_perturbation(rng):
    """Distribution-to-distribution (Mahalanobis) GN matches point-to-plane
    on the wavy-surface recovery problem (fast_gicp D2D analogue)."""
    from perception_tpu.ops.icp import icp_gicp_batch

    gx, gy = np.meshgrid(np.linspace(-0.1, 0.1, 16), np.linspace(-0.1, 0.1, 16))
    gz = 1.0 + 0.05 * np.sin(gx * 40) + 0.03 * np.cos(gy * 30)
    tgt = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1).astype(np.float32)

    from perception_tpu.core.pose import euler_xyz_to_matrix
    true_rot = euler_xyz_to_matrix(0.04, -0.03, 0.05)
    true_t = np.array([0.01, -0.008, 0.012])
    src = (tgt - true_t) @ true_rot

    n_batch = 2
    src_b = np.tile(src[None], (n_batch, 1, 1)).astype(np.float32)
    tgt_b = np.tile(tgt[None], (n_batch, 1, 1)).astype(np.float32)
    ones = np.ones((n_batch, len(tgt)), bool)
    tgt_nrm = cloud_normals(jnp.asarray(tgt_b), jnp.asarray(ones), k=8)
    src_nrm = cloud_normals(jnp.asarray(src_b), jnp.asarray(ones), k=8)
    res = icp_gicp_batch(
        jnp.asarray(src_b), jnp.asarray(ones), src_nrm,
        jnp.asarray(tgt_b), jnp.asarray(ones), tgt_nrm,
        max_iterations=30, max_correspondence=0.1, ref_tile=256)
    delta = np.asarray(res.delta)
    for b in range(n_batch):
        moved = src @ delta[b, :3, :3].T + delta[b, :3, 3]
        err = np.linalg.norm(moved - tgt, axis=1).mean()
        assert err < 2e-3, f"batch {b}: residual {err}"


def test_gicp_converges_at_default_thresholds(rng):
    """Regression: at DEFAULT step-norm thresholds the D2D solver must
    reach the optimum, not stall ~2 cm short. The Mahalanobis weights
    scale H ~1/(2 eps) along normals, so GN steps near the optimum are
    much smaller than p2p steps — a p2p-calibrated step-norm test
    used to fire 15-20 iterations early (the 'gicp AUC collapse');
    icp_gicp_batch now tightens the thresholds internally."""
    from perception_tpu.core.pose import euler_xyz_to_matrix
    from perception_tpu.ops.icp import icp_gicp_batch

    s = 512
    uv = rng.uniform(-0.08, 0.08, (s, 2))
    z = 0.6 + 1.2 * (uv[:, 0] ** 2 + 0.6 * uv[:, 1] ** 2)
    tgt = np.c_[uv, z].astype(np.float32)
    tn = np.c_[-2.4 * uv[:, 0], -1.44 * uv[:, 1], np.ones(s)]
    tn = (tn / np.linalg.norm(tn, axis=1, keepdims=True)).astype(np.float32)
    sel = rng.choice(s, 256, replace=False)

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = euler_xyz_to_matrix(0.1, 0.05, -0.08)
    T[:3, 3] = [0.01, -0.015, 0.02]
    src = tgt[sel] @ T[:3, :3].T + T[:3, 3]
    sn = tn[sel] @ T[:3, :3].T

    res = icp_gicp_batch(
        jnp.asarray(src[None]), jnp.ones((1, 256), bool),
        jnp.asarray(sn[None]),
        jnp.asarray(tgt[None]), jnp.ones((1, s), bool),
        jnp.asarray(tn[None]), max_iterations=60)
    residual = np.asarray(res.delta[0]) @ T
    t_err = np.linalg.norm(residual[:3, 3])
    assert t_err < 2e-3, f"stalled {t_err * 1e3:.1f} mm from optimum"


def test_gicp_underdetermined_identity():
    """< 6 correspondences -> identity delta (guarded solve)."""
    from perception_tpu.ops.icp import icp_gicp_batch

    src = np.zeros((1, 8, 3), np.float32)
    src[0, :, 2] = 1.0
    valid = np.zeros((1, 8), bool)
    valid[0, :3] = True
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (1, 8, 1))
    res = icp_gicp_batch(
        jnp.asarray(src), jnp.asarray(valid), jnp.asarray(nrm),
        jnp.asarray(src), jnp.asarray(valid), jnp.asarray(nrm),
        max_iterations=5, max_correspondence=0.1)
    np.testing.assert_allclose(np.asarray(res.delta[0]), np.eye(4), atol=1e-6)


def test_crop_targets_spread_selection():
    """mode="spread" keeps min(V, k) valid points, covers the 2k extent at
    half density, and fills from the skipped near candidates (r4 advisor
    findings on the round-4 interleave)."""
    from perception_tpu.ops.icp import crop_targets

    s, k = 64, 8
    # Targets on a line at increasing distance from the centre.
    xyz = np.zeros((1, s, 3), np.float32)
    xyz[0, :, 0] = np.arange(s) * 0.01
    centers = np.zeros((1, 3), np.float32)

    # All valid: selection = every 2nd of the 2k nearest.
    valid = np.ones((1, s), bool)
    idx = np.asarray(crop_targets(jnp.asarray(xyz), jnp.asarray(valid),
                                  jnp.asarray(centers), k, mode="spread"))[0]
    assert sorted(idx.tolist()) == [0, 2, 4, 6, 8, 10, 12, 14]

    # Half the even candidates invalid: valid count stays k (odd positions
    # densify), never ceil(V/2) + padding.
    valid2 = np.ones((1, s), bool)
    valid2[0, [0, 4, 8, 12]] = False
    idx2 = np.asarray(crop_targets(jnp.asarray(xyz), jnp.asarray(valid2),
                                   jnp.asarray(centers), k, mode="spread"))[0]
    assert valid2[0, idx2].all()
    assert len(set(idx2.tolist())) == k

    # Fewer than k valid points: every valid point is kept.
    valid3 = np.zeros((1, s), bool)
    valid3[0, :5] = True
    idx3 = np.asarray(crop_targets(jnp.asarray(xyz), jnp.asarray(valid3),
                                   jnp.asarray(centers), k, mode="spread"))[0]
    assert set(np.arange(5)) <= set(idx3.tolist())

    # k <= S < 2k: interleaves what exists rather than truncating to the
    # flat nearest-k patch (positions beyond k must appear).
    xyz4 = xyz[:, :12]
    valid4 = np.ones((1, 12), bool)
    idx4 = np.asarray(crop_targets(jnp.asarray(xyz4), jnp.asarray(valid4),
                                   jnp.asarray(centers), k, mode="spread"))[0]
    assert (idx4 >= k).any()
    assert len(set(idx4.tolist())) == k


def test_crop_targets_spread_matches_rank_sort_reference():
    """The closed-form spread selection (index arithmetic over the valid
    prefix) equals the explicit (invalid-last, parity, position/2) rank
    argsort it replaced, for random validity patterns and all V regimes
    (V > 2k impossible; V in [0, 2k] covered)."""
    from perception_tpu.ops.icp import crop_targets

    rng = np.random.default_rng(7)
    s, k = 96, 16
    for trial in range(20):
        xyz = rng.uniform(-1, 1, (3, s, 3)).astype(np.float32)
        valid = rng.uniform(size=(3, s)) < rng.uniform(0.02, 1.0)
        centers = rng.uniform(-1, 1, (3, 3)).astype(np.float32)

        got = np.asarray(crop_targets(jnp.asarray(xyz), jnp.asarray(valid),
                                      jnp.asarray(centers), k,
                                      mode="spread"))

        # Reference: the pre-round-5 rank-sort formulation.
        d = np.sum((xyz - centers[:, None, :]) ** 2, axis=-1)
        d = np.where(valid, d, np.inf)
        k2 = min(2 * k, s)
        idx = np.argsort(d, axis=1, kind="stable")[:, :k2]
        pos = np.arange(k2)
        base = (pos % 2) * k2 + pos // 2
        cand_valid = np.take_along_axis(valid, idx, axis=1)
        rank = np.where(cand_valid, base[None, :], base[None, :] + 2 * k2)
        order = np.argsort(rank, axis=1, kind="stable")[:, :k]
        ref = np.take_along_axis(idx, order, axis=1)

        # approx_max_k is exact (aggregate_to_topk) at these sizes, but
        # equal distances may tie-break differently — compare the
        # DISTANCES and validity of the selections, which is what the
        # ICP sweep consumes.
        got_d = np.take_along_axis(d, got, axis=1)
        ref_d = np.take_along_axis(d, ref, axis=1)
        np.testing.assert_allclose(
            np.where(np.isinf(got_d), -1.0, got_d),
            np.where(np.isinf(ref_d), -1.0, ref_d), rtol=1e-6,
            err_msg=f"trial {trial}")
