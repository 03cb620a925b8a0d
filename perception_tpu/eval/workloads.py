"""Per-workload experiment entry points.

Mirrors the reference driver's workload functions (fat_pose_image.py:
run_ycb_6d:3307, run_on_image:3540, run_sameshape_gpu:3017,
run_roman_crate_gpu:2582, run_on_conveyor:4007) as thin compositions of
the framework's own pieces: `evaluate_frame` / `run_dataset` cover
run_ycb_6d; this module adds the single-image, same-shape multi-instance
(crate), and conveyor (frame-sequence with warm-started candidates)
workloads.
"""

from __future__ import annotations

import time

import numpy as np

from perception_tpu.eval.ycb import (
    FrameResult,
    YCBFrame,
    generate_candidates,
)


def run_on_image(recognizer, depth: np.ndarray, label_mask: np.ndarray,
                 object_names: list[str], intrinsics,
                 color: np.ndarray | None = None,
                 depth_factor: float = 10000.0,
                 num_samples: int = 60,
                 output_dir: str | None = None):
    """Single-image localization with no ground truth (run_on_image):
    returns the recognizer's LocalizationResult."""
    from perception_tpu.pipeline.env import RecognitionInput

    rin = RecognitionInput(
        depth_image=depth.astype(np.float64),
        color_image=(color.astype(np.float32) if color is not None
                     else None),
        label_mask=label_mask,
        depth_factor=depth_factor,
        cam_to_world=np.eye(4),
        segmented_object_names=object_names,
        use_external_pose_list=True)
    pose_lists = generate_candidates(
        depth, label_mask, object_names, intrinsics,
        depth_factor=depth_factor, num_samples=num_samples)
    return recognizer.localize_objects_greedy_render(
        rin, pose_lists, output_dir=output_dir)


def run_sameshape(recognizer, depth: np.ndarray, label_mask: np.ndarray,
                  model_name: str, num_instances: int, intrinsics,
                  color: np.ndarray | None = None,
                  depth_factor: float = 10000.0,
                  num_samples: int = 60,
                  output_dir: str | None = None):
    """Multiple instances of ONE model (run_sameshape_gpu / crate): each
    instance mask id becomes a segment named `<model>#<k>` backed by the
    same mesh (ModelBank.index_of strips the suffix), so the greedy
    argmin places every instance independently. label_mask must carry
    instance ids 1..num_instances."""
    names = [f"{model_name}#{k + 1}" for k in range(num_instances)]
    return run_on_image(
        recognizer, depth, label_mask, names, intrinsics, color=color,
        depth_factor=depth_factor, num_samples=num_samples,
        output_dir=output_dir)


run_crate = run_sameshape   # run_roman_crate_gpu is the same-shape case
                            # with crate-specific data (reference:2582).


def run_on_conveyor(recognizer, frames: list[YCBFrame],
                    object_names: list[str] | None = None,
                    num_samples: int = 60,
                    warm_start: bool = True,
                    output_root: str | None = None) -> list[FrameResult]:
    """Frame-sequence workload (run_on_conveyor): evaluate frames in
    order; with warm_start, each frame's candidate set is augmented with
    the previous frame's detected poses (the conveyor moves smoothly, so
    the last pose is a strong prior — the reference seeds its sweep the
    same way)."""

    from perception_tpu.core.pose import ContPose

    import os

    results: list[FrameResult] = []
    prev_poses: dict[str, np.ndarray] | None = None
    for frame in frames:
        out_dir = (os.path.join(output_root, frame.scene, frame.frame)
                   if output_root else None)
        res = _evaluate_with_extra_candidates(
            recognizer, frame, prev_poses if warm_start else None,
            object_names, num_samples, out_dir)
        results.append(res)
        prev_poses = res._detected_poses
    return results


def _evaluate_with_extra_candidates(recognizer, frame, extra_poses,
                                    object_names, num_samples, output_dir):
    """evaluate_frame with extra candidate rows appended per object."""
    from perception_tpu.eval.ycb import (
        mask_from_labels,
        recognizer_class_id,
    )
    from perception_tpu.eval.metrics import add_err, adi_err
    from perception_tpu.eval.ycb import YCB_ADDS_OBJECTS, YCB_DEPTH_FACTOR
    from perception_tpu.pipeline.env import RecognitionInput

    names = object_names or [n for n in frame.gt_poses
                             if n in recognizer.bank.names]
    class_ids = [recognizer_class_id(recognizer, frame, n) for n in names]
    instance_mask = mask_from_labels(frame.label, class_ids)
    rin = RecognitionInput(
        depth_image=frame.depth.astype(np.float64),
        color_image=frame.color.astype(np.float32),
        label_mask=instance_mask,
        depth_factor=YCB_DEPTH_FACTOR,
        cam_to_world=np.eye(4),
        segmented_object_names=names,
        use_external_pose_list=True)
    pose_lists = generate_candidates(
        frame.depth, instance_mask, names, frame.intrinsics,
        num_samples=num_samples)
    for name, rows in (extra_poses or {}).items():
        if name in pose_lists:
            pose_lists[name] = np.vstack([pose_lists[name], rows])

    t0 = time.perf_counter()
    result = recognizer.localize_objects_greedy_render(
        rin, pose_lists, output_dir=output_dir)
    runtime = time.perf_counter() - t0

    errors, adds, adis = {}, {}, {}
    detected_rows: dict[str, np.ndarray] = {}
    for name, pose in zip(result.names, result.poses):
        q = pose.quaternion()
        detected_rows[name] = np.asarray(
            [[pose.x, pose.y, pose.z, *q]], np.float64)
        gt = frame.gt_poses.get(name)
        if gt is None:
            continue
        model = recognizer.bank.models[recognizer.bank.index_of(name)]
        pts = model.sample_surface_points()
        est = pose.transform() @ model.preprocessing_transform
        pre_inv = np.linalg.inv(model.preprocessing_transform)
        raw_pts = pts @ pre_inv[:3, :3].T + pre_inv[:3, 3]
        adds[name] = add_err(est[:3, :3], est[:3, 3],
                             gt[:3, :3], gt[:3, 3], raw_pts)
        adis[name] = adi_err(est[:3, :3], est[:3, 3],
                             gt[:3, :3], gt[:3, 3], raw_pts)
        errors[name] = (adis[name] if name in YCB_ADDS_OBJECTS
                        else adds[name])
    res = FrameResult(scene=frame.scene, frame=frame.frame, errors=errors,
                      add_errors=adds, adis_errors=adis,
                      runtime=runtime, detected=result.names)
    res._detected_poses = detected_rows
    return res
