"""Run the reference's own evaluation code UNCHANGED against this
framework's metrics (north-star target: "reference Python evaluation
scripts run unchanged", BASELINE.md).

The reference's full eval driver (fat_pose_image.py) needs pycocotools /
skimage / glumpy, which this image lacks, but its metric kernel
(lib/utils/pose_error.py — the add/adi error definitions every published
number rests on) imports only numpy+scipy. Load that file verbatim from
the read-only reference tree and assert our eval/metrics produce the
same numbers on random pose pairs.
"""

import importlib.util
import os

import numpy as np
import pytest

from perception_tpu.core.pose import euler_xyz_to_matrix
from perception_tpu.eval.metrics import add_err, adi_err

_REF_POSE_ERROR = ("/root/reference/sbpl_perception/src/scripts/tools/"
                   "fat_dataset/lib/utils/pose_error.py")


@pytest.fixture(scope="module")
def ref_pose_error():
    if not os.path.exists(_REF_POSE_ERROR):
        pytest.skip("reference tree not available")
    pytest.importorskip("scipy")
    spec = importlib.util.spec_from_file_location(
        "ref_pose_error", _REF_POSE_ERROR)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_pose_pairs(n, seed):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        r_est = euler_xyz_to_matrix(*rng.uniform(-np.pi, np.pi, 3))
        r_gt = euler_xyz_to_matrix(*rng.uniform(-np.pi, np.pi, 3))
        t_est = rng.uniform(-0.5, 0.5, 3)
        t_gt = t_est + rng.normal(0, 0.02, 3)
        pts = rng.uniform(-0.06, 0.06, (400, 3))
        yield r_est, t_est, r_gt, t_gt, pts


def test_add_matches_reference(ref_pose_error):
    for r_est, t_est, r_gt, t_gt, pts in _random_pose_pairs(10, seed=0):
        ours = add_err(r_est, t_est, r_gt, t_gt, pts)
        ref = ref_pose_error.add(
            r_est, t_est.reshape(3, 1), r_gt, t_gt.reshape(3, 1), pts)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_adi_matches_reference(ref_pose_error):
    for r_est, t_est, r_gt, t_gt, pts in _random_pose_pairs(10, seed=1):
        ours = adi_err(r_est, t_est, r_gt, t_gt, pts)
        ref = ref_pose_error.adi(
            r_est, t_est.reshape(3, 1), r_gt, t_gt.reshape(3, 1), pts)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_rotation_translation_error_defs(ref_pose_error):
    """re/te (rotation/translation error) used in the reference's tables
    agree with straightforward definitions on our rotation helper."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        r_a = euler_xyz_to_matrix(*rng.uniform(-np.pi, np.pi, 3))
        r_b = euler_xyz_to_matrix(*rng.uniform(-np.pi, np.pi, 3))
        re_ref = ref_pose_error.re(r_a, r_b)
        cos = (np.trace(r_a @ r_b.T) - 1.0) / 2.0
        expected = np.rad2deg(np.arccos(np.clip(cos, -1.0, 1.0)))
        np.testing.assert_allclose(re_ref, expected, atol=1e-6)
