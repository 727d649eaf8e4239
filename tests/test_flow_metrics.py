"""Scene-flow EPE/Acc metrics + the bucket-complete benchmark generator."""

import numpy as np
import pytest


class TestFlowMetrics:
    def test_perfect_flow_scores_zero(self):
        from himo_tpu.eval.flow_metrics import FlowMetrics

        rng = np.random.default_rng(0)
        gt = rng.normal(size=(500, 3)).astype(np.float32) * 0.5
        fg = rng.random(500) < 0.4
        m = FlowMetrics()
        m.step(gt, gt, fg)
        s = m.summary()
        assert s["EPE_3way"] == 0.0
        assert s["AccS"] == 1.0 and s["AccR"] == 1.0

    def test_three_way_split_and_acc(self):
        from himo_tpu.eval.flow_metrics import FlowMetrics

        n = 300
        gt = np.zeros((n, 3), np.float32)
        fg = np.zeros(n, bool)
        fg[:100] = True
        gt[:100, 0] = 1.0  # dynamic foreground, 1 m motion
        est = gt.copy()
        est[:100, 0] += 0.08  # 8% error on FD -> AccS fails, AccR passes
        est[200:, 1] = 0.2  # error on background static
        m = FlowMetrics()
        m.step(est, gt, fg)
        s = m.summary()
        assert s["EPE_FD"] == pytest.approx(0.08, abs=1e-6)
        assert s["EPE_FS"] == 0.0
        assert s["EPE_BS"] == pytest.approx(0.2 * 100 / 200, abs=1e-6)
        assert s["AccS"] == 0.0
        assert s["AccR"] == 1.0

    def test_eval_mask_is_respected(self):
        from himo_tpu.eval.flow_metrics import FlowMetrics

        gt = np.zeros((10, 3), np.float32)
        gt[:, 0] = 1.0
        est = gt + 5.0
        mask = np.zeros(10, bool)
        m = FlowMetrics()
        m.step(est, gt, np.ones(10, bool), mask)
        assert m.summary()["EPE_3way"] == 0.0


def test_benchmark_dataset_fills_every_bucket(tmp_path):
    """make_benchmark_dataset populates every (category, velocity, distance)
    cell of the reference eval table."""
    import json

    from himo_tpu.cli.eval import main as eval_main
    from himo_tpu.data.synthetic import make_benchmark_dataset

    root = tmp_path / "av2_buckets"
    make_benchmark_dataset(
        root,
        num_scenes=6,
        num_frames=3,
        objects_per_scene=6,
        points_per_object=200,
        num_background=2000,
        method_flows={"perfect": 0.0},
    )
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        eval_main(data_dir=str(root), res_name="perfect")
        res = json.loads((tmp_path / "res-av2.json").read_text())
    finally:
        os.chdir(cwd)
    entry = res["av2"]["perfect"]
    for cat in ("CAR", "OTHER_VEHICLES"):
        assert entry[cat]["overall"]["num_obj"] > 0
        for kind in ("velocity", "distance"):
            for bucket, cell in entry[cat][kind].items():
                assert cell["num_pts"] > 0, (cat, kind, bucket)
    # Perfect flow must score ~0 everywhere.
    assert entry["CAR"]["overall"]["mpe"] < 1e-4
