"""Per-stage TPU profile of the unified scoring pipeline.

Times each pipeline stage standalone (fori_loop-fenced with forced data
dependencies, single scalar readback — the axon tunnel pattern from
bench.py) so optimisation work targets the measured bottleneck, not the
assumed one.

Usage: python benchmarks/profile_stages.py [n_poses]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))


def timed(fn, *args, inner=10, reps=3):
    """Steady-state seconds per call of jitted fn(*args) -> scalar f32."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def repeated(iters, *a):
        def body(_, carry):
            acc = carry
            s = fn(*a, acc * 1e-30)
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(repeated(1, *args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(repeated(inner, *args))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, compile_s


def main():
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench_scene import build_bench_problem

    from perception_tpu.ops.icp import crop_targets
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets
    from perception_tpu.ops.pointcloud import depth_to_cloud_roi
    from perception_tpu.ops.rasterizer import render_pose_batch
    from perception_tpu.ops.cost import compute_costs_fused
    from perception_tpu.pipeline.scorer import score_pose_batch

    n_poses = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    env, cands, args, cfg = build_bench_problem(n_poses=n_poses)
    cfg = dataclasses.replace(cfg, icp_max_iterations=20)
    (btv, btc, bvl, poses, mids, labels, totals, proj, scene) = args
    bb = env._bank_backface

    results = {}

    # --- full pipeline ---
    def full(p, eps):
        out = score_pose_batch(btv, btc, bvl, p + eps, mids, labels, totals,
                               proj, scene, cfg, bank_backface=bb,
                               bank_icp_samples=env._bank_icp_samples,
                               bank_icp_normals=env._bank_icp_normals)
        return out.rendered_cost.sum()

    results["full_pipeline"], c = timed(full, poses)
    print(f"full_pipeline: {results['full_pipeline']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    # --- stage 1: raster (one pass) ---
    def raster(p, eps):
        out = render_pose_batch(
            btv, btc, bvl, p + eps, mids, proj, bank_backface=bb,
            width=cfg.width, height=cfg.height, stride=cfg.stride,
            source_depth=scene.source_depth, source_label=scene.source_label,
            pose_labels=labels, occlusion_threshold=cfg.occlusion_threshold,
            use_segmentation_label=cfg.use_segmentation_label,
            tile=cfg.raster_tile, backend=cfg.backend,
            roi_shape=cfg.roi_shape)
        return out.depth.sum().astype(jnp.float32)

    results["raster"], c = timed(raster, poses)
    print(f"raster(1x):    {results['raster']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    # Materialise one render for downstream stages.
    render = render_pose_batch(
        btv, btc, bvl, poses, mids, proj, bank_backface=bb,
        width=cfg.width, height=cfg.height, stride=cfg.stride,
        source_depth=scene.source_depth, source_label=scene.source_label,
        pose_labels=labels, occlusion_threshold=cfg.occlusion_threshold,
        use_segmentation_label=cfg.use_segmentation_label,
        tile=cfg.raster_tile, backend=cfg.backend, roi_shape=cfg.roi_shape)

    # --- stage 2: depth -> cloud (ROI) ---
    def cloud_fn(depth, color, anchors, eps):
        cl = depth_to_cloud_roi(
            depth + (eps != 12345.0).astype(jnp.int32) * 0, color, anchors,
            fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
            width=cfg.width, height=cfg.height, stride=cfg.stride,
            depth_factor=cfg.depth_factor)
        return cl.xyz.sum() + eps * 0

    results["cloud"], c = timed(cloud_fn, render.depth, render.color,
                                render.anchors)
    print(f"cloud:         {results['cloud']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    cloud = depth_to_cloud_roi(
        render.depth, render.color, render.anchors,
        fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
        width=cfg.width, height=cfg.height, stride=cfg.stride,
        depth_factor=cfg.depth_factor)

    ds = cfg.icp_downsample
    src_xyz = cloud.xyz[:, ::ds]
    src_valid = cloud.valid[:, ::ds]
    labels_c = jnp.clip(labels, 0, scene.seg_xyz.shape[0] - 1)

    # --- stage 3: ICP prep (crop + pack + gathers) ---
    k = min(cfg.icp_crop_targets or 256, scene.seg_xyz.shape[1])

    def icp_prep(sx, sv, eps):
        sx = sx + eps
        tgt_xyz = scene.seg_xyz[labels_c]
        tgt_valid = scene.seg_valid[labels_c]
        centers = (jnp.sum(sx * sv[..., None], axis=1)
                   / jnp.maximum(sv.sum(axis=1), 1)[:, None])
        cidx = crop_targets(tgt_xyz, tgt_valid, centers, k)
        seg_pk = pack_targets(scene.seg_xyz, scene.seg_valid,
                              scene.seg_normals)[labels_c]
        pk = jnp.take_along_axis(seg_pk, cidx[..., None], axis=1)
        return pk.sum()

    results["icp_prep"], c = timed(icp_prep, src_xyz, src_valid)
    print(f"icp_prep:      {results['icp_prep']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    centers = (jnp.sum(src_xyz * src_valid[..., None], axis=1)
               / jnp.maximum(src_valid.sum(axis=1), 1)[:, None])
    cidx = crop_targets(scene.seg_xyz[labels_c], scene.seg_valid[labels_c],
                        centers, k)
    seg_pk = pack_targets(scene.seg_xyz, scene.seg_valid,
                          scene.seg_normals)[labels_c]
    tgt_pk = jnp.take_along_axis(seg_pk, cidx[..., None], axis=1)

    # --- stage 4: fused ICP kernel ---
    def icp_run(sx, sv, pk, eps):
        delta = icp_fused_pallas(
            sx + eps, sv, pk,
            max_iterations=cfg.icp_max_iterations,
            max_correspondence=cfg.icp_max_correspondence,
            nn_every=cfg.icp_nn_every,
            rotation_epsilon=cfg.icp_rotation_epsilon,
            transformation_epsilon=cfg.icp_transformation_epsilon)
        return delta.sum()

    results["icp_fused"], c = timed(icp_run, src_xyz, src_valid, tgt_pk)
    print(f"icp_fused:     {results['icp_fused']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    # --- stage 5: cost kernel ---
    def cost_fn(cx, cv, eps):
        costs = compute_costs_fused(
            cx + eps, cv, render.pose_occluded,
            scene.seg_xyz[labels_c], scene.seg_valid[labels_c], totals,
            sensor_resolution=cfg.sensor_resolution)
        return costs.rendered_cost.sum()

    results["cost_fused"], c = timed(cost_fn, cloud.xyz, cloud.valid)
    print(f"cost_fused:    {results['cost_fused']*1e3:8.3f} ms  "
          f"(compile {c:.1f}s)", flush=True)

    accounted = (results["raster"] * 2 + results["cloud"] * 2
                 + results["icp_prep"] + results["icp_fused"]
                 + results["cost_fused"])
    print(f"\nsum(2*raster + 2*cloud + prep + icp + cost) = "
          f"{accounted*1e3:.3f} ms vs full {results['full_pipeline']*1e3:.3f} "
          f"ms (diff = fusion/overlap/launch)")
    print(f"poses/s (full): {n_poses / results['full_pipeline']:,.0f}")


if __name__ == "__main__":
    main()
