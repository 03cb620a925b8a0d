"""External-detection mask ingestion (PoseCNN .mat / COCO detections)."""

import json

import numpy as np
import pytest

from perception_tpu.io.masks import (
    MaskDetections,
    decode_segmentation,
    load_coco_detections,
    load_posecnn_mat,
)

CLASSES = ["002_master_chef_can", "003_cracker_box", "004_sugar_box"]


def _write_posecnn_mat(path, labels, rois):
    from scipy.io import savemat

    savemat(path, {"labels": labels, "rois": rois})


def test_posecnn_mat_roundtrip(tmp_path):
    labels = np.zeros((48, 64), np.uint8)
    labels[10:20, 8:24] = 2      # cracker box
    labels[30:40, 40:60] = 3     # sugar box
    # rois rows: [batch, class_id, cmin, rmin, cmax, rmax, score]
    rois = np.array([
        [0, 2, 8, 10, 23, 19, 0.9],
        [0, 3, 40, 30, 59, 39, 0.8],
    ], np.float64)
    p = tmp_path / "000001.mat"
    _write_posecnn_mat(p, labels, rois)

    det = load_posecnn_mat(str(p), CLASSES)
    assert det.names == ["003_cracker_box", "004_sugar_box"]
    assert det.masks[0].sum() == 10 * 16
    # ROI centroid mode: centre of the (+1/-1 adjusted) box.
    cx, cy = det.centroids[0]
    assert abs(cx - (9 + 22) / 2) < 1e-6 and abs(cy - (11 + 18) / 2) < 1e-6

    mask, names = det.label_mask(required_objects=["004_sugar_box"])
    assert names == ["004_sugar_box"]
    assert set(np.unique(mask)) == {0, 1}
    assert mask[35, 50] == 1 and mask[15, 10] == 0


def test_posecnn_mask_centroid_mode(tmp_path):
    labels = np.zeros((20, 20), np.uint8)
    labels[5:10, 5:15] = 1
    p = tmp_path / "000002.mat"
    _write_posecnn_mat(p, labels, np.array([[0, 1, 0, 0, 0, 0, 1.0]]))
    det = load_posecnn_mat(str(p), CLASSES, centroid_type="mask")
    assert det.names == ["002_master_chef_can"]
    cx, cy = det.centroids[0]
    assert abs(cx - (5 + 14) / 2) < 1e-6 and abs(cy - (5 + 9) / 2) < 1e-6


def test_uncompressed_rle_decode():
    # 3x4 image, column-major runs: 2 zeros, 3 ones, 7 zeros.
    seg = {"size": [3, 4], "counts": [2, 3, 7]}
    mask = decode_segmentation(seg, 0, 0)
    assert mask.shape == (3, 4)
    expect = np.zeros((3, 4), bool)
    flat_cm = np.zeros(12, bool)
    flat_cm[2:5] = True
    expect = flat_cm.reshape((4, 3)).T
    assert (mask == expect).all()


def test_compressed_rle_roundtrip_against_known():
    # Compressed form of [2, 3, 7] per COCO's rleToString scheme (delta
    # coding from two back, 5-bit groups, +48 ascii).
    def encode(counts):
        out = bytearray()
        for i, x in enumerate(counts):
            if i > 2:
                x = x - counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                out.append(c + 48)
        return bytes(out)

    seg = {"size": [3, 4], "counts": encode([2, 3, 7])}
    mask = decode_segmentation(seg, 0, 0)
    ref = decode_segmentation({"size": [3, 4], "counts": [2, 3, 7]}, 0, 0)
    assert (mask == ref).all()


def test_coco_detections_polygon(tmp_path):
    data = {
        "images": [{"id": 7, "file_name": "0001/000001-color.png",
                    "height": 40, "width": 60}],
        "categories": [{"id": 2, "name": "003_cracker_box"}],
        "annotations": [{
            "image_id": 7, "category_id": 2, "score": 0.95,
            "bbox": [10, 5, 20, 10],
            "segmentation": [[10, 5, 30, 5, 30, 15, 10, 15]],
        }],
    }
    p = tmp_path / "det.json"
    p.write_text(json.dumps(data))
    det = load_coco_detections(str(p), file_name="000001-color.png")
    assert det.names == ["003_cracker_box"]
    assert det.masks[0].shape == (40, 60)
    assert det.masks[0][10, 20]
    assert not det.masks[0][30, 50]
    mask, names = det.label_mask()
    assert names == ["003_cracker_box"]
    assert mask.max() == 1


def test_coco_detections_bare_list_bbox_only(tmp_path):
    data = [{"image_id": 1, "category_id": 3, "score": 0.5,
             "bbox": [2, 2, 4, 4]}]
    p = tmp_path / "det.json"
    p.write_text(json.dumps(data))
    det = load_coco_detections(str(p), class_list=CLASSES, image_id=1,
                               height=10, width=10)
    assert det.names == ["004_sugar_box"]
    assert det.masks[0][3, 3] and not det.masks[0][9, 9]


def test_label_mask_required_object_missing():
    det = MaskDetections(names=["003_cracker_box"],
                         masks=[np.ones((4, 4), bool)],
                         boxes=[(0, 0, 3, 3)], centroids=[(1.5, 1.5)])
    with pytest.raises(ValueError):
        det.label_mask(required_objects=["004_sugar_box"])
