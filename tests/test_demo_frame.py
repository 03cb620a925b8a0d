"""Real-sensor regression: the reference's captured demo frame.

The synthetic zoo can't cover real noise, holes, clutter and a
background person; the one real capture the reference ships
(sbpl_perception/demo, driven by its demo.cpp via the 3-DoF image path,
search_env.cpp:5916-5952) can. No external GT exists for it, so the
pseudo-GT is this framework's own fine-grid oracle (frozen in
tests/data/demo_frame_pseudo_gt.json by
`examples/demo_reference_scene.py --oracle`): the regression asserts the
deployment-coarseness config still lands each proxy on the same physical
object the oracle found — real-data behaviour changes move these poses.
"""

from __future__ import annotations

import numpy as np
import pytest

from perception_tpu.eval import demo_frame


pytestmark = pytest.mark.skipif(
    not demo_frame.available(),
    reason="reference demo capture not on disk")


def test_demo_frame_matches_pseudo_gt():
    gt = demo_frame.load_pseudo_gt()
    if gt is None:
        pytest.skip("pseudo-GT not frozen yet (run --oracle)")

    # Deployment config coarsened for test runtime (res 0.04 grid,
    # stride 8): tolerance below covers the grid's own 2.8 cm worst-case
    # offset plus winner drift across strides.
    env = demo_frame.build_env(stride=8, res=0.04, theta_res=np.pi / 4)
    depth, _ = demo_frame.load_input(env)
    n_obs = int(np.asarray(env._observed.count))
    assert n_obs > 100, "bounds filter found no tabletop points"

    state, chosen = demo_frame.localise(env)
    assert state.num_objects == 3, "expected all three proxies placed"

    for sel in state.object_states:
        name = env.bank.models[sel.id].name
        p = gt["poses"][name]
        err = float(np.hypot(sel.pose.x - p["x"], sel.pose.y - p["y"]))
        assert err < 0.08, (name, sel.pose.x, sel.pose.y, p, err)
