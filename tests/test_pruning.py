"""Successor pruning (histogram/voxel) + PointsInsideMesh analogue."""

import dataclasses

import numpy as np
import pytest

from tests.test_core import make_box
from tests.test_pipeline import gt_states, make_env


def test_points_inside_mesh_box():
    from perception_tpu.core.mesh import mesh_model_from_arrays

    v, f = make_box(0.2, 0.2, 0.2)
    m = mesh_model_from_arrays("box", v, f)
    vmin, vmax = m.bounds
    center = (vmin + vmax) / 2
    pts = np.array([
        center,                       # inside
        center + [0.0, 0.0, 0.099],   # inside near top
        vmax + 0.05,                  # outside
        center + [0.3, 0.0, 0.0],     # outside laterally
    ])
    inside = m.points_inside(pts)
    np.testing.assert_array_equal(inside, [True, True, False, False])


def test_points_inside_mesh_transform():
    from perception_tpu.core.mesh import mesh_model_from_arrays

    v, f = make_box(0.2, 0.2, 0.2)
    m = mesh_model_from_arrays("box", v, f)
    vmin, vmax = m.bounds
    center = (vmin + vmax) / 2
    t = np.eye(4)
    t[:3, 3] = [1.0, 2.0, 3.0]
    pts = np.array([center + t[:3, 3], center])
    inside = m.points_inside(pts, transform=t)
    np.testing.assert_array_equal(inside, [True, False])


def test_points_inside_footprint():
    from perception_tpu.core.mesh import mesh_model_from_arrays

    v, f = make_box(0.2, 0.1, 0.1)
    m = mesh_model_from_arrays("box", v, f)
    hull = m.footprint_hull()
    cx, cy = hull.mean(axis=0)
    inside = m.points_inside_footprint(
        np.array([[cx, cy], [cx + 1.0, cy]]))
    np.testing.assert_array_equal(inside, [True, False])


def test_histogram_scores_discriminate():
    from perception_tpu.pipeline.pruning import histogram_scores

    h, w = 24, 32
    depth = np.zeros((2, h, w), np.int32)
    depth[:, 8:16, 8:24] = 60
    red = np.zeros((h, w, 3))
    red[8:16, 8:24] = [200, 30, 30]
    green = np.zeros((h, w, 3))
    green[8:16, 8:24] = [30, 200, 30]
    rendered = np.stack([red, green])
    dist = histogram_scores(rendered, depth, observed_color=red)
    assert dist[0] < 0.3           # same colours
    assert dist[1] > dist[0] + 0.2  # wrong colours score worse


def test_voxel_changed_fraction():
    from perception_tpu.pipeline.pruning import voxel_changed_fraction

    rng = np.random.default_rng(0)
    observed = rng.uniform(0, 1, (500, 3))
    match = observed[:200] + 0.001          # same voxels
    off = observed[:200] + np.array([5.0, 0, 0])   # all new voxels
    frac = voxel_changed_fraction([match, off], observed, resolution=0.02)
    assert frac[0] < 0.05
    assert frac[1] > 0.3


def test_prune_successors_3dof_keeps_gt():
    """Voxel pruning on the synthetic 3-DoF scene keeps near-GT candidates
    and prunes far-off-table ones."""
    env = make_env()
    gt = gt_states()
    env.set_observation_from_states(gt)
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState
    from perception_tpu.pipeline.pruning import prune_successors

    good = ObjectState(id=0, symmetric=False, pose=gt[0].pose,
                       segmentation_label_id=1)
    far_pose = ContPose.from_euler(
        gt[0].pose.x + 0.8, gt[0].pose.y + 0.8, gt[0].pose.z, 0, 0, 0)
    bad = ObjectState(id=0, symmetric=False, pose=far_pose,
                      segmentation_label_id=1)
    kept = prune_successors(env, [good, bad], use_voxels=True,
                            max_changed_fraction=0.5)
    assert good in kept
    assert bad not in kept
