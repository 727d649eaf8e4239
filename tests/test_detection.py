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


class TestLearnedDetector:
    """Center-point DetNet: targets, decode round-trip, and train+eval."""

    def _cfg(self):
        from himo_tpu.downstream.det_net import DetNetConfig
        from himo_tpu.ops.voxelize import PillarConfig

        return DetNetConfig(
            pillar=PillarConfig(
                x_range=(-38.4, 38.4), y_range=(-38.4, 38.4), voxel_size=(1.2, 1.2)
            ),
            depths=(16, 32),
            point_feat_dim=8,
            base_channels=8,
            max_detections=8,
        )

    def test_render_and_decode_roundtrip(self):
        """A perfect prediction (targets as logits) decodes back to the box."""
        import jax.numpy as jnp
        import numpy as np

        from himo_tpu.downstream.det_net import decode_boxes, render_targets

        cfg = self._cfg()
        box = np.array([5.0, -3.0, 0.2, 4.2, 1.9, 1.6, 0.4], np.float32)
        t = render_targets([box], cfg)
        assert t["mask"].sum() == 1
        logits = jnp.asarray(np.where(t["heat"] >= 0.999, 8.0, -8.0))
        boxes, scores = decode_boxes(logits, jnp.asarray(t["reg"]), cfg)
        best = np.asarray(boxes)[0]
        assert float(scores[0]) > 0.9
        np.testing.assert_allclose(best[:2], box[:2], atol=0.05)
        np.testing.assert_allclose(best[3:6], box[3:6], rtol=0.05)
        assert abs(((best[6] - box[6]) + np.pi) % (2 * np.pi) - np.pi) < 0.05

    def test_train_eval_beats_baseline_and_raw(self, tmp_path):
        """Trained DetNet detects on synthetic val; compensated >= raw, and
        learned >= the geometric cluster-fit baseline on compensated clouds."""
        from himo_tpu.data.synthetic import make_dataset
        from himo_tpu.downstream.det_net import (
            evaluate_detection_learned,
            make_det_model,
            train_detector,
        )

        root = tmp_path / "av2_detnet"
        make_dataset(
            root, num_scenes=2, num_frames=5, seed=33, num_background=800,
            method_flows={"perfect": 0.0},
        )
        cfg = self._cfg()
        from himo_tpu.downstream.det_net import DetNet

        model = DetNet(cfg)
        params = train_detector(
            str(root), model=model, num_points=4096, epochs=30, verbose=False
        )
        comp = evaluate_detection_learned(
            str(root), model, params, flow_mode="perfect", num_points=4096,
            verbose=False,
        )
        raw = evaluate_detection_learned(
            str(root), model, params, flow_mode="raw", num_points=4096,
            verbose=False,
        )
        assert comp["tp"] > 0, "trained detector must find objects"
        assert comp["f1"] >= raw["f1"] - 1e-6
        # vs the geometric cluster-fit baseline on the same compensated clouds
        base = evaluate_detection(
            str(root),
            flow_mode="perfect",
            config=DetectionConfig(min_points=10, dbscan_eps=1.2),
            verbose=False,
        )
        assert comp["f1"] >= base["f1"] - 1e-6, (comp["f1"], base["f1"])
