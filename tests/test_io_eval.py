"""Tests for the I/O contracts and the evaluation stack."""

import numpy as np

from perception_tpu.core.pose import ContPose, euler_xyz_to_matrix
from perception_tpu.eval.metrics import (
    add_err,
    adi_err,
    compute_pose_metrics,
    rot_err_deg,
    trans_err,
)
from perception_tpu.eval.sampling import (
    get_rotation_samples,
    poses_from_rotations,
    sphere_fibonacci_grid,
)
from perception_tpu.io.poses_file import (
    read_output_poses,
    read_poses_file,
    write_output_poses,
    write_output_stats,
)
from perception_tpu.utils.stats import EnvStats


def test_poses_file_roundtrip(tmp_path):
    rows = np.array([
        [0.5, 0.1, -0.02, 0, 0, 0, 1],
        [0.6, -0.1, 0.03, 0, 0, 0.7071, 0.7071],
    ])
    path = tmp_path / "poses.txt"
    np.savetxt(path, rows)  # the reference driver writes via np.savetxt
    got = read_poses_file(str(path))
    np.testing.assert_allclose(got, rows, atol=1e-12)


def test_output_poses_contract(tmp_path):
    pre = np.eye(4)
    pre[:3, 3] = [-0.01, 0.02, -0.05]
    pose = ContPose.from_quat(0.5, 0.1, 0.0, 0, 0, 0.258819, 0.9659258)
    path = str(tmp_path / "output_poses.txt")
    write_output_poses(path, [("003_cracker_box", pose, pre)])

    # Parse exactly the way perch.py does (13-line records).
    with open(path) as f:
        lines = f.readlines()
    assert len(lines) == 13
    recs = read_output_poses(path)
    assert recs[0]["name"] == "003_cracker_box"
    expected_tf = pose.transform() @ pre
    np.testing.assert_allclose(recs[0]["transform_matrix"], expected_tf, atol=1e-6)
    np.testing.assert_allclose(
        recs[0]["preprocessing_transform_matrix"], pre, atol=1e-6)
    np.testing.assert_allclose(recs[0]["location"], expected_tf[:3, 3], atol=1e-6)
    q = recs[0]["quaternion_xyzw"]
    assert np.isclose(abs(q[2]), 0.258819, atol=1e-5)


def test_output_stats_contract(tmp_path):
    stats = EnvStats(scenes_rendered=1234, scenes_valid=900, expands=10,
                     time=1.5, cost=42, icp_time=0.3)
    path = str(tmp_path / "output_stats.txt")
    write_output_stats(path, stats)
    with open(path) as f:
        lines = f.readlines()
    vals = [float(v) for v in lines[2].split()]
    # perch.py reads [0]=rendered, [2]=expands, [3]=runtime, [5]=icp, [6]=mem.
    assert vals[0] == 1234 and vals[2] == 10 and vals[3] == 1.5 and vals[5] == 0.3


def test_fibonacci_sphere():
    pts = sphere_fibonacci_grid(60)
    assert pts.shape == (60, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-9)
    half = sphere_fibonacci_grid(60, half=True)
    assert half.shape == (30, 3)
    assert (half[:, 1] <= 0.01).all()  # lower half in y


def test_rotation_samples_modes():
    base = get_rotation_samples("002_master_chef_can", 40)   # mode (0,0)
    assert base.shape == (20, 3)  # half sphere, 1 rot per viewpoint
    clamp = get_rotation_samples("051_large_clamp", 40)      # mode (0,7)
    assert clamp.shape == (80, 3)  # 4 in-plane yaw per viewpoint
    banana = get_rotation_samples("011_banana", 40)          # mode (1,0)
    assert banana.shape == (40, 3)  # whole sphere
    rows = poses_from_rotations(base, np.array([0.5, 0.1, 0.9]))
    assert rows.shape == (20, 7)
    np.testing.assert_allclose(np.linalg.norm(rows[:, 3:], axis=1), 1, atol=1e-9)


def test_add_adi_metrics(rng):
    pts = rng.normal(size=(100, 3))
    r_gt = euler_xyz_to_matrix(0.1, 0.2, 0.3)
    t_gt = np.array([0.5, 0.0, 1.0])
    assert add_err(r_gt, t_gt, r_gt, t_gt, pts) < 1e-12
    # Pure translation offset: ADD equals the offset norm.
    t_est = t_gt + [0.01, 0, 0]
    assert np.isclose(add_err(r_gt, t_est, r_gt, t_gt, pts), 0.01)
    # ADD-S is always <= ADD.
    r_est = euler_xyz_to_matrix(0.1, 0.2, 0.5)
    assert (adi_err(r_est, t_gt, r_gt, t_gt, pts)
            <= add_err(r_est, t_gt, r_gt, t_gt, pts) + 1e-9)
    assert np.isclose(rot_err_deg(r_gt, r_gt), 0.0, atol=1e-4)
    assert np.isclose(trans_err(t_est, t_gt), 0.01)


def test_auc_protocol():
    # All-perfect poses -> AUC 100.
    perfect = np.zeros(50)
    m = compute_pose_metrics(perfect.copy())
    assert np.isclose(m["auc"], 100.0, atol=0.5)
    assert m["pose_error_less_perc"] == 100.0
    # All failures -> AUC 0.
    bad = np.full(50, 1.0)
    m = compute_pose_metrics(bad.copy())
    assert m["auc"] < 1.0
    assert m["pose_error_less_perc"] == 0.0
    # Uniform errors in [0, 0.1] -> AUC ~50.
    uniform = np.linspace(0, 0.0999, 200)
    m = compute_pose_metrics(uniform.copy())
    assert 45 < m["auc"] < 55


def test_model_cache_roundtrip(tmp_path):
    """load_model_cached: second load comes from the .npz cache and equals
    the direct load; cache invalidates on parameter change."""
    import numpy as np

    from perception_tpu.core.mesh import load_model
    from perception_tpu.io.model_cache import load_model_cached
    from tests.test_core import make_box

    v, f = make_box(0.1, 0.08, 0.06)
    ply = tmp_path / "box.ply"
    with open(ply, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for row in v:
            fh.write(f"{row[0]} {row[1]} {row[2]}\n")
        for row in f:
            fh.write(f"3 {row[0]} {row[1]} {row[2]}\n")

    cache = str(tmp_path / "cache")
    kw = dict(name="box", target_triangles=16, symmetric=True)
    m1 = load_model_cached(str(ply), cache_dir=cache, **kw)
    files = [p for p in __import__("os").listdir(cache) if p.endswith(".npz")]
    assert len(files) == 1
    m2 = load_model_cached(str(ply), cache_dir=cache, **kw)
    ref = load_model(str(ply), **kw)
    for a in (m1, m2):
        np.testing.assert_array_equal(a.tri_verts, ref.tri_verts)
        np.testing.assert_array_equal(a.tri_colors, ref.tri_colors)
        assert a.symmetric and a.backface_cullable == ref.backface_cullable
        assert a.name == "box"
    # Different params -> new cache entry.
    load_model_cached(str(ply), cache_dir=cache, name="box",
                      target_triangles=8, symmetric=True)
    files = [p for p in __import__("os").listdir(cache) if p.endswith(".npz")]
    assert len(files) == 2


def test_dope_baseline_ingestion_and_eval(tmp_path):
    """DOPE annotation dumps (cm locations, xyzw quaternions,
    dope_image.py contract) -> shared AUC protocol."""
    import json

    from perception_tpu.eval.dope import (
        evaluate_dope_results, load_dope_annotations, quat_xyzw_to_matrix)

    # 90-degree yaw about z as xyzw.
    q = [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    r = quat_xyzw_to_matrix(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    pts = np.array([[0.05, 0, 0], [0, 0.05, 0], [0, 0, 0.05],
                    [-0.05, 0, 0]])
    gt_pose = {"category_id": 1, "r": np.eye(3),
               "t": np.array([0.0, 0.0, 0.6])}

    # Image A: exact detection (locations in CM) + a decoy category.
    json.dump([
        {"location": [0.0, 0.0, 60.0],
         "quaternion_xyzw": [0, 0, 0, 1], "category_id": 1, "id": 0},
        {"location": [100.0, 0.0, 60.0],
         "quaternion_xyzw": [0, 0, 0, 1], "category_id": 2, "id": 1},
    ], open(tmp_path / "frame_a.json", "w"))
    # Image B: detection 3 cm off.
    json.dump([
        {"location": [3.0, 0.0, 60.0],
         "quaternion_xyzw": [0, 0, 0, 1], "category_id": 1, "id": 0},
    ], open(tmp_path / "frame_b.json", "w"))
    # Image C: no dump on disk -> missing detection counts as failure.

    anns = load_dope_annotations(str(tmp_path / "frame_a.json"))
    assert len(anns) == 2
    np.testing.assert_allclose(anns[0]["t"], [0, 0, 0.6])

    gt = {"frame_a": [gt_pose], "frame_b": [gt_pose], "frame_c": [gt_pose]}
    out = evaluate_dope_results(str(tmp_path), gt, {1: pts})
    assert out["total"] == 3
    assert out["detected"] == 2
    assert out["errors"][0] < 1e-9
    assert abs(out["errors"][1] - 0.03) < 1e-9
    assert out["errors"][2] == np.inf


def test_densefusion_baseline_ingestion_and_eval(tmp_path):
    """DenseFusion result .mat files (wxyz quaternion + metre translation
    rows, densefusion.py:350 contract) -> shared AUC protocol."""
    import scipy.io as scio

    from perception_tpu.eval.densefusion import (
        evaluate_densefusion_results, load_densefusion_mat,
        quat_wxyz_to_matrix)

    # 90-degree yaw about z as wxyz.
    q = [np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]
    r = quat_wxyz_to_matrix(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    pts = np.array([[0.05, 0, 0], [0, 0.05, 0], [0, 0, 0.05],
                    [-0.05, 0, 0]])
    gt_pose = {"category_id": 1, "r": np.eye(3),
               "t": np.array([0.0, 0.0, 0.6])}

    # Keyframe A: exact detection + a decoy class + an all-zero failed row.
    scio.savemat(tmp_path / "0001.mat", {"poses": [
        [1.0, 0, 0, 0, 0.0, 0.0, 0.6],
        [1.0, 0, 0, 0, 1.0, 0.0, 0.6],
        [0.0] * 7,
    ]})
    # Keyframe B: detection 3 cm off.
    scio.savemat(tmp_path / "0002.mat", {"poses": [
        [1.0, 0, 0, 0, 0.03, 0.0, 0.6],
    ]})
    # Keyframe C: no dump on disk -> missing detection counts as failure.

    dets = load_densefusion_mat(str(tmp_path / "0001.mat"), class_ids=[1, 2])
    assert len(dets) == 2                  # zero row dropped
    np.testing.assert_allclose(dets[0]["t"], [0, 0, 0.6])
    assert dets[1]["category_id"] == 2

    gt = {"0001": [gt_pose], "0002": [gt_pose], "0003": [gt_pose]}
    out = evaluate_densefusion_results(
        str(tmp_path), gt, {1: pts},
        class_ids={"0001": [1, 2], "0002": [1]})
    assert out["total"] == 3
    assert out["detected"] == 2
    assert out["errors"][0] < 1e-9
    assert abs(out["errors"][1] - 0.03) < 1e-9
    assert out["errors"][2] == np.inf
