"""A/B: two-stage pallas raster vs fully-fused direct raster (real TPU)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from benchmarks.bench_scene import build_bench_problem
from benchmarks.harness import time_op
from perception_tpu.ops.rasterizer import render_pose_batch


def main():
    env, cands, args, cfg = build_bench_problem(n_poses=512)
    (btv, btc, bok, poses, ids, labels, totals, proj, scene) = args
    print("backend:", jax.default_backend(), flush=True)

    kwargs = dict(
        width=cfg.width, height=cfg.height, stride=cfg.stride,
        source_depth=scene.source_depth, source_label=scene.source_label,
        pose_labels=labels, occlusion_threshold=cfg.occlusion_threshold,
        use_segmentation_label=cfg.use_segmentation_label,
        tile=cfg.raster_tile, roi_shape=cfg.roi_shape,
        bank_backface=env._render_bank[3])

    outs = {}
    for be in ("pallas", "pallas_direct", "pallas_bin"):
        def fn(p, be=be):
            out = render_pose_batch(btv, btc, bok, p, ids, proj,
                                    backend=be, **kwargs)
            return (out.depth.astype(jnp.float32),)

        sec = time_op(fn, poses, inner=10, outer=3)
        out = render_pose_batch(btv, btc, bok, poses, ids, proj,
                                backend=be, **kwargs)
        outs[be] = np.asarray(out.depth)
        print(f"{be:14s} {sec*1e3:7.3f} ms/batch "
              f"({512/sec:,.0f} renders/s)", flush=True)

    for be in ("pallas_direct", "pallas_bin"):
        same = (outs["pallas"] == outs[be]).mean()
        d = np.abs(outs["pallas"].astype(np.int64)
                   - outs[be].astype(np.int64))
        print(f"{be} vs pallas: {same*100:.4f}% identical, "
              f"max |d| cm: {d.max()}, mismatching px: {(d > 0).sum()}")


if __name__ == "__main__":
    main()
