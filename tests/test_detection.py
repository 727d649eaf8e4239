"""Detection harness: box fitting, BEV IoU, and the raw-vs-compensated gap."""

import numpy as np
import pytest

from himo_tpu.downstream.detection import (
    DetectionConfig,
    bev_iou,
    detect_frame,
    evaluate_detection,
    fit_bev_box,
    gt_boxes_from_instances,
    match_detections,
)


def test_fit_bev_box_axis_aligned(rng):
    pts = rng.uniform(-1, 1, size=(200, 3)) * [2.0, 1.0, 0.8] + [5, 3, 1]
    box = fit_bev_box(pts.astype(np.float32))
    assert box[0] == pytest.approx(5, abs=0.2)
    assert box[1] == pytest.approx(3, abs=0.2)
    l, w = sorted([box[3], box[4]], reverse=True)
    assert l == pytest.approx(4.0, rel=0.15)
    assert w == pytest.approx(2.0, rel=0.15)


def test_bev_iou_identical_and_disjoint():
    box = np.array([0, 0, 0, 4, 2, 1.5, 0.3], np.float32)
    assert bev_iou(box, box) > 0.95
    far = box.copy()
    far[0] += 100
    assert bev_iou(box, far) == 0.0


def test_match_detections_counts():
    gt = [np.array([0, 0, 0, 4, 2, 1.5, 0.0], np.float32)]
    det_good = [np.array([0.2, 0.1, 0, 4, 2, 1.5, 0.0], np.float32)]
    det_bad = [np.array([50, 0, 0, 4, 2, 1.5, 0.0], np.float32)]
    m = match_detections(det_good + det_bad, gt)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 0
    assert m["mean_iou"] > 0.5


def test_compensation_improves_detection(tmp_path):
    """On fast objects, de-skewed clouds must detect at least as well as raw
    (higher mean IoU of matched boxes)."""
    from himo_tpu.data.synthetic import make_dataset

    root = tmp_path / "av2_det"
    make_dataset(
        root, num_scenes=1, num_frames=4, seed=31, num_background=800,
        method_flows={"perfect": 0.0},
    )
    cfg = DetectionConfig(min_points=10, dbscan_eps=1.2)
    comp = evaluate_detection(
        str(root), flow_mode="perfect", config=cfg, verbose=False
    )
    raw = evaluate_detection(str(root), flow_mode="raw", config=cfg, verbose=False)
    assert comp["tp"] > 0
    assert comp["mean_iou"] >= raw["mean_iou"]
    # With 15-22 m/s objects smeared over up to 2.2 m, the gap is material.
    assert comp["mean_iou"] - raw["mean_iou"] > 0.02
