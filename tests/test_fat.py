"""FAT dataset reader / YCB-layout converter / COCO export."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def fat_root(tmp_path):
    """Synthetic two-frame FAT scene fixture."""
    scene = tmp_path / "kitchen_0"
    scene.mkdir()
    (scene / "_object_settings.json").write_text(json.dumps({
        "exported_object_classes": ["003_cracker_box_16k",
                                    "005_tomato_soup_can_16k"],
        "exported_objects": [
            {"class": "003_cracker_box_16k", "segmentation_class_id": 12},
            {"class": "005_tomato_soup_can_16k", "segmentation_class_id": 20},
        ],
    }))
    (scene / "_camera_settings.json").write_text(json.dumps({
        "camera_settings": [{
            "name": "left",
            "intrinsic_settings": {"fx": 320.0, "fy": 321.0,
                                   "cx": 64.0, "cy": 48.0},
            "captured_image_size": {"width": 128, "height": 96},
        }],
    }))
    rng = np.random.default_rng(0)
    for i in range(2):
        stem = f"{i:06d}.left"
        color = rng.integers(0, 255, (96, 128, 3), np.uint8)
        depth = rng.integers(5000, 9000, (96, 128)).astype(np.uint16)
        seg = np.zeros((96, 128), np.uint8)
        seg[10:30, 10:40] = 12
        seg[50:70, 60:90] = 20
        cv2.imwrite(str(scene / f"{stem}.jpg"), color)
        cv2.imwrite(str(scene / f"{stem}.depth.png"), depth)
        cv2.imwrite(str(scene / f"{stem}.seg.png"), seg)
        (scene / f"{stem}.json").write_text(json.dumps({
            "camera_data": {},
            "objects": [
                {"class": "003_cracker_box_16k",
                 "location": [10.0, -5.0, 80.0],      # cm
                 "quaternion_xyzw": [0, 0, 0, 1]},
                {"class": "005_tomato_soup_can_16k",
                 "location": [-8.0, 2.0, 95.0],
                 "quaternion_xyzw": [0, 0, 0.7071068, 0.7071068]},
            ],
        }))
    return str(tmp_path)


def test_fat_reader(fat_root):
    from perception_tpu.eval.fat import FATDataset

    fat = FATDataset(fat_root)
    assert list(fat.scenes) == ["kitchen_0"]
    assert fat.classes == ["003_cracker_box_16k", "005_tomato_soup_can_16k"]
    frames = fat.frames("kitchen_0")
    assert frames == ["000000", "000001"]
    fr = fat.load_frame("kitchen_0", "000000")
    assert fr.intrinsics.fx == 320.0 and fr.intrinsics.width == 128
    # Label remap: seg id 12 -> class 1, 20 -> class 2.
    assert (fr.label == 1).sum() == 20 * 30
    assert (fr.label == 2).sum() == 20 * 30
    # cm -> m and quaternion conversion.
    box = fr.gt_poses["003_cracker_box_16k"]
    np.testing.assert_allclose(box[:3, 3], [0.10, -0.05, 0.80])
    can = fr.gt_poses["005_tomato_soup_can_16k"]
    np.testing.assert_allclose(can[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_fat_to_ycb_roundtrip(fat_root, tmp_path):
    from perception_tpu.eval.fat import FATDataset, convert_to_ycb_layout
    from perception_tpu.eval.ycb import YCBVideoDataset

    fat = FATDataset(fat_root)
    out = str(tmp_path / "ycb")
    n = convert_to_ycb_layout(fat, out)
    assert n == 2

    ds = YCBVideoDataset(out)
    assert ds.classes == fat.classes
    assert ds.keyframes() == [("kitchen_0", "000000"),
                              ("kitchen_0", "000001")]
    ref = fat.load_frame("kitchen_0", "000001")
    got = ds.load_frame("kitchen_0", "000001")
    np.testing.assert_array_equal(got.depth, ref.depth)
    np.testing.assert_array_equal(got.label, ref.label)
    np.testing.assert_allclose(
        got.gt_poses["003_cracker_box_16k"],
        ref.gt_poses["003_cracker_box_16k"], atol=1e-6)
    assert got.intrinsics.fx == ref.intrinsics.fx


def test_fat_coco_export(fat_root, tmp_path):
    from perception_tpu.eval.fat import FATDataset, export_coco

    fat = FATDataset(fat_root)
    path = str(tmp_path / "coco.json")
    coco = export_coco(fat, path)
    assert os.path.exists(path)
    assert len(coco["images"]) == 2
    assert len(coco["categories"]) == 2
    assert len(coco["annotations"]) == 4
    ann = coco["annotations"][0]
    assert ann["bbox"] == [10, 10, 30, 20]
    assert ann["area"] == 600
    # RLE counts must sum to the image size.
    assert sum(ann["segmentation"]["counts"]) == 96 * 128


def test_shapestacks_converter_round_trip(tmp_path):
    """Synthesized ShapeStacks layout -> COCO -> masks.py ingestion."""
    import cv2

    from perception_tpu.eval.shapestacks import (
        block_count, convert_shapestacks_coco, seg_file_for)
    from perception_tpu.io.masks import load_coco_detections

    assert block_count("ccs-easy-h=3-vcom=0-vpsf=0-n=2") == 2
    assert seg_file_for("rgb-env_ccs-n=2-cam_2-r=1-mono-0.png", 1) == (
        "vseg-env_ccs-n=2-cam_2-seg-1.png")

    scen = "env_ccs-easy-h=2-vcom=0-vpsf=0-n=2"
    sdir = tmp_path / "rec" / scen
    sdir.mkdir(parents=True)
    h, w = 48, 64
    rgb = np.zeros((h, w, 3), np.uint8)
    cv2.imwrite(str(sdir / f"rgb-{scen}-cam_2-r=1-mono-0.png"), rgb)
    m0 = np.zeros((h, w), np.uint8)
    m0[10:20, 12:30] = 255
    m1 = np.zeros((h, w), np.uint8)
    m1[25:40, 5:15] = 255
    cv2.imwrite(str(sdir / f"vseg-{scen}-cam_2-seg-0.png"), m0)
    cv2.imwrite(str(sdir / f"vseg-{scen}-cam_2-seg-1.png"), m1)
    # A mirrored scenario and an excluded camera must be skipped.
    (tmp_path / "rec" / (scen + "_r")).mkdir()
    cv2.imwrite(str(sdir / f"rgb-{scen}-cam_1-r=1-mono-0.png"), rgb)

    out_path = str(tmp_path / "ss_coco.json")
    coco = convert_shapestacks_coco(
        str(tmp_path / "rec"), [scen, scen + "_r"], out_path)
    assert len(coco["images"]) == 1
    assert len(coco["annotations"]) == 2
    assert coco["annotations"][0]["bbox"] == [12, 10, 18, 10]
    assert coco["annotations"][0]["area"] == 180

    det = load_coco_detections(out_path, image_id=1)
    assert len(det.masks) == 2
    np.testing.assert_array_equal(det.masks[0], m0 > 0)
    np.testing.assert_array_equal(det.masks[1], m1 > 0)
