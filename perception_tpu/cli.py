"""Command-line entry point: the `perch_fat` executable, pure Python.

The reference launches `mpirun -n 6 perch_fat <output_dir>` with all inputs
passed through the ROS parameter server (perch.py:177-233). Here the same
run is one process with one YAML/JSON config:

    python -m perception_tpu.cli localize --config scene.yaml --output out/

Config schema (all paths relative to the config file unless absolute):

    camera: {fx, fy, cx, cy, width, height}
    input:
      depth_image: depth.png          # 16-bit
      color_image: rgb.png            # optional
      label_mask: mask.png            # instance mask (6-DoF)
      depth_factor: 10000             # sensor units per metre
      cam_to_world: [[...4x4...]]     # optional, default identity-optical
      segmented_object_names: [...]
    model_bank:
      - {name: 003_cracker_box, path: models/003/textured.ply,
         flipped: false, symmetric: false, symmetry_mode: 1}
    mesh_in_mm: false
    mesh_scaling_factor: 0.001
    rendered_root_dir: poses_dir      # <obj>/poses.txt candidate files
    perch_params: {...}               # reference env-config YAML keys
    mode: greedy | tree | greedy_icp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_image(path: str, gray: bool = False) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if not gray and img.ndim == 3:
            img = img[..., ::-1]  # BGR -> RGB
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path))


def _resolve(base: str, path: str) -> str:
    return path if os.path.isabs(path) else os.path.join(base, path)


def cmd_localize(args: argparse.Namespace) -> int:
    from perception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import yaml

    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.pipeline.env import RecognitionInput
    from perception_tpu.pipeline.recognizer import ModelSpec, ObjectRecognizer

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    base = os.path.dirname(os.path.abspath(args.config))

    cam = CameraIntrinsics(**cfg["camera"])
    perch = PerchConfig.from_yaml_dict(cfg)
    env_cfg = EnvConfig.from_yaml_dict(cfg.get("env_params", {}))
    env_cfg = env_cfg.__class__(**{**env_cfg.__dict__,
                                   "width": cam.width, "height": cam.height})

    specs = [ModelSpec(
        name=m["name"], path=_resolve(base, m["path"]),
        flipped=m.get("flipped", False),
        symmetric=m.get("symmetric", False),
        symmetry_mode=m.get("symmetry_mode", 0))
        for m in cfg["model_bank"]]

    mode = cfg.get("mode", "greedy")
    use_external = mode != "greedy_icp" and cfg.get("use_external_pose_list", 1)

    t0 = time.perf_counter()
    recognizer = ObjectRecognizer(
        specs, cam, perch, env_cfg,
        mesh_in_mm=cfg.get("mesh_in_mm", False),
        mesh_scaling_factor=cfg.get("mesh_scaling_factor", 0.001),
        use_external_pose_list=bool(use_external),
        target_triangles=env_cfg.max_triangles_per_model)
    print(f"model bank loaded in {time.perf_counter() - t0:.2f}s "
          f"({len(specs)} models)")

    inp = cfg["input"]
    depth = _load_image(_resolve(base, inp["depth_image"]), gray=True)
    color = (_load_image(_resolve(base, inp["color_image"]))
             if inp.get("color_image") else None)
    label = (_load_image(_resolve(base, inp["label_mask"]), gray=True)
             if inp.get("label_mask") else None)
    cam_to_world = np.asarray(
        inp.get("cam_to_world", np.eye(4).tolist()), np.float64)

    seg_names = inp.get("segmented_object_names", [s.name for s in specs])
    # External-detection mask modes (reference mask_type posecnn/mask_rcnn):
    # a PoseCNN results .mat or a COCO detections json supplies the instance
    # mask + per-object names instead of a painted label image.
    if inp.get("posecnn_mat"):
        from perception_tpu.io.masks import load_posecnn_mat

        det = load_posecnn_mat(_resolve(base, inp["posecnn_mat"]),
                               inp.get("class_list", [s.name for s in specs]))
        label, seg_names = det.label_mask(required_objects=seg_names)
    elif inp.get("detections_json"):
        from perception_tpu.io.masks import load_coco_detections

        det = load_coco_detections(
            _resolve(base, inp["detections_json"]),
            class_list=inp.get("class_list", [s.name for s in specs]),
            image_id=inp.get("detections_image_id"),
            file_name=inp.get("color_image"),
            height=depth.shape[0], width=depth.shape[1],
            score_threshold=float(inp.get("detection_threshold", 0.0)))
        label, seg_names = det.label_mask(required_objects=seg_names)

    rin = RecognitionInput(
        depth_image=depth.astype(np.float64),
        color_image=None if color is None else color.astype(np.float32),
        label_mask=None if label is None else label.astype(np.int32),
        depth_factor=float(inp.get("depth_factor", 100.0)),
        cam_to_world=cam_to_world,
        segmented_object_names=seg_names,
        x_min=inp.get("x_min", -1.0), x_max=inp.get("x_max", 1.0),
        y_min=inp.get("y_min", -1.0), y_max=inp.get("y_max", 1.0),
        table_height=inp.get("table_height", 0.0),
        use_external_pose_list=bool(use_external))

    out_dir = args.output
    if mode == "greedy":
        pose_lists = recognizer.read_pose_lists(
            _resolve(base, cfg["rendered_root_dir"]))
        result = recognizer.localize_objects_greedy_render(
            rin, pose_lists, output_dir=out_dir)
    elif mode == "greedy_icp":
        result = recognizer.localize_objects_greedy_icp(rin, output_dir=out_dir)
    elif mode == "tree":
        result = recognizer.localize_objects(rin, output_dir=out_dir)
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2

    stats = recognizer.env.stats
    print(json.dumps({
        "detected": result.names,
        "poses": [[p.x, p.y, p.z, *p.quaternion()] for p in result.poses],
        "scenes_rendered": stats.scenes_rendered,
        "time": round(stats.time, 3),
        "output_dir": out_dir,
    }))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="perception_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    loc = sub.add_parser("localize", help="run pose estimation on one scene")
    loc.add_argument("--config", required=True)
    loc.add_argument("--output", required=True)
    loc.set_defaults(func=cmd_localize)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
