"""Tests for auxiliary subsystems: cloud utils, dataset generator,
heuristics, config parser, debug dumps, stats."""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.io.config_parser import parse_scene_config
from perception_tpu.pipeline.heuristics import (
    Detection,
    DetectionHeuristicFactory,
    load_detections,
)
from perception_tpu.core.pose import ContPose
from perception_tpu.core.state import Discretizer, GraphState, ObjectState, StateHashManager
from perception_tpu.utils.cloud_utils import (
    euclidean_clusters,
    fit_plane_ransac,
    passthrough_filter,
    remove_plane,
    statistical_outlier_removal,
    voxel_downsample,
)
from perception_tpu.utils.debug import colorize_depth, save_batch_grid


def test_plane_fit_and_removal(rng):
    plane = np.c_[rng.uniform(-1, 1, (400, 2)), np.zeros(400)]
    blob = rng.normal([0.2, 0.1, 0.3], 0.03, (100, 3))
    pts = np.vstack([plane, blob])
    coeffs, mask = fit_plane_ransac(pts, 0.01)
    assert abs(abs(coeffs[2]) - 1.0) < 0.02      # normal ~ z
    assert mask[:400].mean() > 0.97
    remaining, _ = remove_plane(pts, 0.02)
    assert 80 <= len(remaining) <= 110


def test_euclidean_clusters(rng):
    a = rng.normal([0, 0, 0], 0.01, (50, 3))
    b = rng.normal([1, 0, 0], 0.01, (30, 3))
    clusters = euclidean_clusters(np.vstack([a, b]), tolerance=0.1, min_size=5)
    assert [len(c) for c in clusters] == [50, 30]


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1.0, 1, 1]])
    out = voxel_downsample(pts, 0.1)
    assert len(out) == 2
    assert np.allclose(sorted(out[:, 0]), [0.0005, 1.0])


def test_filters(rng):
    pts = rng.uniform(-1, 1, (200, 3))
    kept = passthrough_filter(pts, 2, 0.0, 1.0)
    assert (kept[:, 2] >= 0).all()
    with_outlier = np.vstack([rng.normal(0, 0.05, (100, 3)), [[5, 5, 5]]])
    cleaned = statistical_outlier_removal(with_outlier, k=10)
    assert len(cleaned) == 100


def test_dataset_generator():
    from perception_tpu.eval.dataset_gen import DatasetGenerator
    from tests.test_pipeline import make_env

    env = make_env()
    gen = DatasetGenerator(env, np.random.default_rng(2))
    scene = gen.sample_scene(num_objects=2, x_range=(0.5, 0.7),
                             y_range=(-0.15, 0.15), yaw_only=True)
    assert len(scene.states) == 2
    assert (scene.depth > 0).sum() > 50
    assert set(np.unique(scene.label)) >= {0, 1}
    # Generated scene round-trips through set_input.
    env.set_observation_from_states(scene.states)
    counts = np.asarray(env._observed.seg_count)
    assert counts[0] > 0


def test_detection_heuristics(tmp_path):
    cam = CameraIntrinsics(fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                           width=128, height=96)
    det = Detection(name="red_box", bbox=(54, 38, 74, 58))
    factory = DetectionHeuristicFactory([det], cam)
    names = ["red_box"]
    near = ObjectState(0, False, ContPose.from_quat(0, 0, 1.0, 0, 0, 0, 1), 1)
    far = ObjectState(0, False, ContPose.from_quat(0.5, 0.3, 1.0, 0, 0, 0, 1), 1)
    h = factory.heuristic(names)
    assert h(near) < h(far)
    pruned = factory.prune([near, far], names, max_pixel_dist=20)
    assert pruned == [near]
    # Disk round trip.
    import json

    path = tmp_path / "dets.json"
    path.write_text(json.dumps([{"name": "red_box", "bbox": [54, 38, 74, 58],
                                 "score": 0.9}]))
    loaded = load_detections(str(path))
    assert loaded[0].name == "red_box" and loaded[0].score == 0.9


def test_scene_config_parser(tmp_path):
    cfg_text = (
        "data/pc.pcd\n2\n"
        "models/a.ply\nmodels/b.ply\n"
        "true\nfalse\n"
        "false\ntrue\n"
        "-0.5 0.5\n-0.4 0.4\n0.7\n"
        "1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n")
    p = tmp_path / "scene.txt"
    p.write_text(cfg_text)
    cfg = parse_scene_config(str(p), base_dir="/base")
    assert cfg.pcd_file_path == "/base/data/pc.pcd"
    assert cfg.model_names == ["a", "b"]
    assert cfg.model_symmetries == [True, False]
    assert cfg.model_flippings == [False, True]
    assert cfg.min_x == -0.5 and cfg.max_y == 0.4 and cfg.table_height == 0.7
    assert np.allclose(cfg.camera_pose, np.eye(4))


def test_state_hash_manager():
    disc = Discretizer()
    mgr = StateHashManager(disc)
    s1 = GraphState((ObjectState(0, False, ContPose.from_euler(0.1, 0.2, 0, 0, 0, 0.5), 1),))
    s2 = GraphState((ObjectState(0, False, ContPose.from_euler(0.1001, 0.2001, 0, 0, 0, 0.5001), 1),))
    s3 = GraphState((ObjectState(0, False, ContPose.from_euler(0.5, 0.2, 0, 0, 0, 0.5), 1),))
    assert mgr.get_id(s1) == mgr.get_id(s2)   # same discrete cell
    assert mgr.get_id(s1) != mgr.get_id(s3)
    assert mgr.get_state(mgr.get_id(s1)).num_objects == 1
    # Order independence.
    o1 = ObjectState(0, False, ContPose.from_euler(0.1, 0.2, 0, 0, 0, 0.0), 1)
    o2 = ObjectState(1, False, ContPose.from_euler(0.4, 0.1, 0, 0, 0, 0.0), 2)
    assert (GraphState((o1, o2)).hash_key(disc)
            == GraphState((o2, o1)).hash_key(disc))
    # Symmetric objects ignore yaw.
    sym_a = ObjectState(2, True, ContPose.from_euler(0.1, 0.2, 0, 0, 0, 0.3), 1)
    sym_b = ObjectState(2, True, ContPose.from_euler(0.1, 0.2, 0, 0, 0, 2.1), 1)
    assert sym_a.hash_key(disc) == sym_b.hash_key(disc)


def test_debug_dumps(tmp_path):
    depth = np.zeros((2, 16, 16), np.int32)
    depth[0, 4:12, 4:12] = 100
    depth[1, 2:6, 2:6] = 50
    rgb = colorize_depth(depth[0])
    assert rgb.shape == (16, 16, 3)
    assert rgb[8, 8, 0] > 0
    out = tmp_path / "grid.png"
    save_batch_grid(depth, str(out), costs=[12, 34])
    assert out.exists()


def test_vfh_estimator():
    from perception_tpu.eval.vfh import VFHPoseEstimator, compute_vfh
    from tests.test_pipeline import make_env

    env = make_env()
    # Need an input context for render_composite's pose transform.
    from perception_tpu.pipeline.env import RecognitionInput
    env._input = RecognitionInput(depth_image=np.zeros((96, 128)),
                                  cam_to_world=np.eye(4))
    est = VFHPoseEstimator(env)
    n = est.train(num_views=8, distance=0.7)
    assert n >= 8

    # Descriptor is a normalised 308-vector.
    e = est.entries[0]
    assert e.descriptor.shape == (308,)
    assert np.isfinite(e.descriptor).all()

    # Query with a training view's own cloud -> same model comes back.
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    state = ObjectState(id=1, symmetric=False,
                        pose=ContPose.from_euler(0, 0, 0.7, 0, e.pitch, e.yaw),
                        segmentation_label_id=1)
    pts, nrm = est._view_cloud(state)
    match = est.estimate(pts, nrm, k=3)
    assert any(m.name == "green_box" for m in match)


def test_inpaint_depth_image():
    from perception_tpu.utils.cloud_utils import (
        inpaint_depth_image,
        organized_cloud_from_depth,
    )

    h, w = 60, 80
    depth = np.full((h, w), 800, np.uint16)   # 0.8 m plane
    depth[20:30, 30:40] = 0                    # hole
    cloud = organized_cloud_from_depth(depth, 100, 100, w / 2, h / 2,
                                       depth_factor=1000.0)
    mask = np.zeros((h, w), np.uint8)
    mask[15:35, 25:45] = 1
    out = inpaint_depth_image(cloud, mask, max_range=2.0)
    # Hole filled close to the surrounding plane; valid pixels untouched.
    assert abs(out[25, 35] - 0.8) < 0.05
    assert abs(out[5, 5] - 0.8) < 1e-9
    # Invalid pixels outside the requested mask stay empty.
    depth2 = depth.copy()
    depth2[50:55, 60:65] = 0
    cloud2 = organized_cloud_from_depth(depth2, 100, 100, w / 2, h / 2,
                                        depth_factor=1000.0)
    out2 = inpaint_depth_image(cloud2, mask, max_range=2.0)
    assert out2[52, 62] == 0.0


def test_range_image_planar():
    from perception_tpu.utils.cloud_utils import range_image_planar

    pts = np.array([[0.0, 0.0, 1.0],    # centre pixel, range 1
                    [0.1, 0.0, 1.0],    # off-centre, range sqrt(1.01)
                    [0.0, 0.0, 0.5]])   # same pixel as first, closer
    img = range_image_planar(pts, fx=100, fy=100, cx=40, cy=30,
                             width=80, height=60)
    assert img.shape == (60, 80)
    assert abs(img[30, 40] - 0.5) < 1e-9       # min range wins
    assert abs(img[30, 50] - np.sqrt(1.01)) < 1e-9
    assert np.isneginf(img[0, 0])


def test_euclidean_clustering_organized():
    from perception_tpu.utils.cloud_utils import (
        euclidean_clustering_organized,
    )

    cloud = np.full((20, 20, 3), np.nan)
    ys, xs = np.mgrid[0:20, 0:20]
    grid = np.stack([xs * 0.001, ys * 0.001, np.ones_like(xs, float)], -1)
    cloud[2:8, 2:8] = grid[2:8, 2:8]             # cluster A (36 px)
    cloud[12:18, 12:18] = grid[12:18, 12:18]     # cluster B
    cloud[12:18, 12:18, 2] += 0.5                # offset in z from cluster A
    clusters = euclidean_clustering_organized(cloud, 0.01, min_cluster_size=10)
    assert len(clusters) == 2
    assert {len(c) for c in clusters} == {36}
    # Points separated beyond the threshold never merge even when adjacent.
    cloud2 = np.full((4, 4, 3), np.nan)
    cloud2[:, :2] = 0.0
    cloud2[:, 2:] = 1.0   # 1 m jump between columns 1 and 2
    out = euclidean_clustering_organized(cloud2, 0.01, min_cluster_size=2)
    assert len(out) == 2


def test_view_generator_banks(tmp_path):
    """view_generator: icosphere counts match PCL's vertex mode, poses put
    the object in front of the camera, every view sees the object."""
    import numpy as np

    from perception_tpu.tools.view_generator import (
        generate_views,
        icosphere_vertices,
        look_at_pose,
    )

    assert len(icosphere_vertices(0)) == 12
    assert len(icosphere_vertices(1)) == 42
    assert len(icosphere_vertices(2)) == 162

    for v in icosphere_vertices(0):
        pose = look_at_pose(v, 0.7)
        # Rotation orthonormal, origin at (0, 0, distance).
        r = pose[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(pose[:3, 3], [0, 0, 0.7], atol=1e-9)

    from perception_tpu.core.config import CameraIntrinsics
    from perception_tpu.core.mesh import mesh_model_from_arrays
    from tests.test_core import make_box

    verts, faces = make_box(0.12, 0.1, 0.08)
    model = mesh_model_from_arrays("box", verts, faces)
    cam = CameraIntrinsics(fx=120.0, fy=120.0, cx=48.0, cy=48.0,
                           width=96, height=96)
    clouds, poses, entropy = generate_views(model, cam, level=0,
                                            distance=0.7, stride=2)
    assert len(clouds) == 12 and poses.shape == (12, 4, 4)
    assert all(len(c) > 10 for c in clouds)
    assert entropy.max() == 1.0 and entropy.min() > 0.0


def test_sensor_model_degrades_and_is_deterministic():
    import numpy as np
    from perception_tpu.eval.sensor_model import KINECT_CLASS, NOISELESS, by_name

    rng = np.random.default_rng(7)
    depth = np.zeros((64, 64))
    depth[16:48, 16:48] = 0.8
    depth[24:40, 24:40] = 0.6   # a step edge inside the object
    color = np.full((64, 64, 3), 128.0)

    d1, c1 = KINECT_CLASS.apply(depth, color, np.random.default_rng(7))
    d2, c2 = KINECT_CLASS.apply(depth, color, np.random.default_rng(7))
    assert np.array_equal(d1, d2) and np.array_equal(c1, c2)

    valid_before = (depth > 0).sum()
    valid_after = (d1 > 0).sum()
    assert valid_after < valid_before            # edge dropout happened
    assert valid_after > 0.7 * valid_before      # but not catastrophic
    changed = d1[(d1 > 0) & (depth > 0)]
    ref = depth[(d1 > 0) & (depth > 0)]
    assert np.abs(changed - ref).max() > 1e-4    # noise + quantisation
    assert np.abs(changed - ref).max() < 0.05    # bounded
    assert not np.array_equal(c1, color)

    dn, cn = NOISELESS.apply(depth, color, np.random.default_rng(7))
    assert np.array_equal(dn, depth) and np.array_equal(cn, color)
    assert by_name("kinect2x").depth_std == 2 * KINECT_CLASS.depth_std


def test_env_sensor_hook():
    """set_observation_from_states(sensor=...) must yield a DIFFERENT
    observed cloud from the clean render (the de-circularisation hook)."""
    import numpy as np
    from perception_tpu.eval.sensor_model import KINECT_CLASS
    from tests.test_pipeline import make_env, gt_states

    env = make_env()
    env.set_observation_from_states(gt_states())
    clean = np.asarray(env._observed.seg_xyz).copy()
    clean_count = int(np.asarray(env._observed.count))
    env.set_observation_from_states(
        gt_states(), sensor=KINECT_CLASS, rng=np.random.default_rng(3))
    noisy = np.asarray(env._observed.seg_xyz)
    noisy_count = int(np.asarray(env._observed.count))
    assert not np.array_equal(clean, noisy)
    assert noisy_count < clean_count     # dropout removed pixels
    assert noisy_count > clean_count // 2
