"""Tree-search and full CLI end-to-end tests on synthetic scenes."""

import os

import numpy as np
import pytest
import yaml

from perception_tpu.core.pose import ContPose
from perception_tpu.core.state import ObjectState
from perception_tpu.pipeline.search import TreeSearch

from tests.test_core import make_box
from tests.test_pipeline import CAM, gt_states, make_env


def jittered_candidates(gt, rng, n=8, sigma=0.025):
    cands = []
    for obj in gt:
        cands.append(obj)
        for _ in range(n):
            j = rng.normal(0, sigma, 3)
            p = ContPose.from_quat(obj.pose.x + j[0], obj.pose.y + j[1],
                                   obj.pose.z + j[2], *obj.pose.quaternion())
            cands.append(ObjectState(id=obj.id, symmetric=False, pose=p,
                                     segmentation_label_id=obj.segmentation_label_id))
    return cands


def test_tree_search_recovers_scene():
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    cands = jittered_candidates(gt, np.random.default_rng(7))
    search = TreeSearch(env, beam_width=2, candidates_per_model=cands)
    state = search.plan()
    assert state.num_objects == 2
    assert search.stats.expands >= 2
    for sel in state.object_states:
        true = gt[sel.id]
        err = np.linalg.norm(
            np.array([sel.pose.x, sel.pose.y, sel.pose.z])
            - np.array([true.pose.x, true.pose.y, true.pose.z]))
        assert err < 0.02, f"object {sel.id} off by {err}"


def _write_box_ply(path, w, d, h, rgb):
    verts, faces = make_box(w, d, h)
    header = (
        "ply\nformat ascii 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n")
    with open(path, "w") as f:
        f.write(header)
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]} {rgb[0]} {rgb[1]} {rgb[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


@pytest.mark.slow
def test_cli_localize_greedy(tmp_path):
    """Full contract: config + images + poses.txt in, output_poses.txt out."""
    import cv2

    from perception_tpu.cli import main as cli_main
    from perception_tpu.io.poses_file import read_output_poses

    # Models on disk.
    models = tmp_path / "models"
    models.mkdir()
    _write_box_ply(models / "red_box.ply", 0.12, 0.08, 0.10, (200, 40, 40))
    _write_box_ply(models / "green_box.ply", 0.06, 0.06, 0.16, (40, 200, 40))

    # Observation: render GT with the library itself (simulated sensor).
    env = make_env()
    gt = gt_states()
    depth, color, label = env.render_composite(gt)
    # Depth in cm -> write as 16-bit with depth_factor 1000 (mm).
    depth_png = (depth.astype(np.float64) * 10).astype(np.uint16)  # cm -> mm
    cv2.imwrite(str(tmp_path / "depth.png"), depth_png)
    cv2.imwrite(str(tmp_path / "mask.png"), label.astype(np.uint8))
    cv2.imwrite(str(tmp_path / "rgb.png"),
                color[..., ::-1].astype(np.uint8))

    # Candidate poses.txt per object: GT + jitter.
    rng = np.random.default_rng(11)
    poses_dir = tmp_path / "rendered"
    for obj, name in zip(gt, ["red_box", "green_box"]):
        d = poses_dir / name
        d.mkdir(parents=True)
        rows = [[obj.pose.x, obj.pose.y, obj.pose.z, *obj.pose.quaternion()]]
        for _ in range(6):
            j = rng.normal(0, 0.02, 3)
            rows.append([obj.pose.x + j[0], obj.pose.y + j[1],
                         obj.pose.z + j[2], *obj.pose.quaternion()])
        np.savetxt(d / "poses.txt", np.asarray(rows))

    cam_to_world = np.asarray(env._input.cam_to_world if env._input else
                              np.eye(4))
    from perception_tpu.core.pose import CAM_TO_BODY
    config = {
        "camera": {"fx": CAM.fx, "fy": CAM.fy, "cx": CAM.cx, "cy": CAM.cy,
                   "width": CAM.width, "height": CAM.height},
        "input": {
            "depth_image": "depth.png",
            "color_image": "rgb.png",
            "label_mask": "mask.png",
            "depth_factor": 1000,
            "cam_to_world": CAM_TO_BODY.tolist(),
            "segmented_object_names": ["red_box", "green_box"],
        },
        "model_bank": [
            {"name": "red_box", "path": "models/red_box.ply"},
            {"name": "green_box", "path": "models/green_box.ply"},
        ],
        "rendered_root_dir": "rendered",
        "mode": "greedy",
        "use_external_pose_list": 1,
        "perch_params": {
            "gpu_stride": 2, "gpu_batch_size": 64,
            "sensor_resolution_radius": 0.02,
            "min_neighbor_points_for_valid_pose": 5,
            "icp_type": 3, "max_icp_iterations": 10,
        },
        "env_params": {
            "max_points_per_pose": 512, "max_observed_points": 4096,
            "max_points_per_label": 1024, "max_labels": 4,
            "max_triangles_per_model": 16,
        },
    }
    cfg_path = tmp_path / "scene.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    out_dir = tmp_path / "out"
    rc = cli_main(["localize", "--config", str(cfg_path),
                   "--output", str(out_dir)])
    assert rc == 0
    recs = read_output_poses(str(out_dir / "output_poses.txt"))
    names = {r["name"] for r in recs}
    assert names == {"red_box", "green_box"}
    assert os.path.exists(out_dir / "output_stats.txt")
    assert os.path.exists(out_dir / "cost_dump.json")
    # Detected translations near GT.
    for r in recs:
        obj = gt[0] if r["name"] == "red_box" else gt[1]
        # location = (pose @ preprocessing) translation; preprocessing for
        # these centred boxes has small translation, so compare loosely.
        err = np.linalg.norm(np.asarray(r["location"])
                             - [obj.pose.x, obj.pose.y, obj.pose.z])
        assert err < 0.12, f"{r['name']}: {err}"


def test_tree_search_lazy_matches_full():
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    cands = jittered_candidates(gt, np.random.default_rng(7))
    full = TreeSearch(env, beam_width=2, candidates_per_model=cands).plan()
    lazy_search = TreeSearch(env, beam_width=2, candidates_per_model=cands,
                             lazy_k=4)
    lazy = lazy_search.plan()
    assert lazy.num_objects == 2
    # Lazy result recovers the same scene (within grid tolerance).
    for a in lazy.object_states:
        b = next(s for s in full.object_states if s.id == a.id)
        assert np.hypot(a.pose.x - b.pose.x, a.pose.y - b.pose.y) < 0.02


def test_compose_cache_equals_rerender():
    """Min-depth composition of cached single-object renders must equal a
    fresh composite render, and re-composing the same object must not
    re-render (search_env.cpp:741-771 cached-composition semantics)."""
    from perception_tpu.pipeline.search import _Node
    from perception_tpu.core.state import GraphState

    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    stride = int(env.perch.gpu_stride)
    h, w = CAM.height // stride, CAM.width // stride

    search = TreeSearch(env, beam_width=1, candidates_per_model=gt)
    empty = _Node(GraphState(), 0, np.zeros((h, w), np.int32),
                  np.zeros((h, w), np.int32), frozenset())
    d1, l1 = search._compose(empty, gt[0])
    node1 = _Node(GraphState().append(gt[0]), 0, d1, l1, frozenset({gt[0].id}))
    d2, _ = search._compose(node1, gt[1])
    assert search.stats.scenes_rendered == 2

    direct, _, _ = env.render_composite(list(gt))
    np.testing.assert_array_equal(d2, direct[::stride, ::stride])

    # Same objects again: compose must come entirely from cache.
    search._compose(empty, gt[0])
    search._compose(node1, gt[1])
    assert search.stats.scenes_rendered == 2


def test_counted_pixels_no_double_count():
    """Counted-pixels mode: claimed masks are disjoint along a branch, the
    second object's claim excludes the first's pixels, and the search
    still recovers the scene (GetSourceCost/counted_pixels_map_ parity)."""
    from perception_tpu.pipeline.search import _Node
    from perception_tpu.core.state import GraphState

    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    cands = jittered_candidates(gt, np.random.default_rng(7))

    search = TreeSearch(env, beam_width=2, candidates_per_model=cands,
                        counted_pixels=True)
    state = search.plan()
    assert state.num_objects == 2
    for sel in state.object_states:
        true = gt[sel.id]
        err = np.linalg.norm(
            np.array([sel.pose.x, sel.pose.y, sel.pose.z])
            - np.array([true.pose.x, true.pose.y, true.pose.z]))
        assert err < 0.02

    # Direct disjointness check: claim object 0 at GT, then object 1's
    # claimed mask must avoid those pixels.
    stride = int(env.perch.gpu_stride)
    h, w = CAM.height // stride, CAM.width // stride
    root = _Node(GraphState(), 0, np.asarray(env._source_depth),
                 np.zeros((h, w), np.int32), frozenset(),
                 counted=np.zeros((h, w), bool))
    scored = env.score_object_states([gt[0], gt[1]], do_icp=False)
    (c0, claim0), (c1, claim1) = search._counted_costs(root, scored)
    assert claim0.any() and claim1.any()
    # GT objects explain their own claims -> low corrected source cost.
    assert c0 <= scored[0].target_cost + 35
    node1 = _Node(GraphState().append(gt[0]), c0,
                  root.source_depth, root.source_label,
                  frozenset({gt[0].id}), counted=root.counted | claim0)
    (_, claim1b), = search._counted_costs(node1, [scored[1]])
    assert not (claim1b & claim0).any()
