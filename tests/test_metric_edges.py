"""Edge-case parity tests for the evaluation semantics.

These pin the reference's quirks (eval.py:88-114): the <10-point and
min-velocity instance filters, the half-open velocity buckets with 0
falling in NO bucket, and point-count-weighted aggregation."""

import numpy as np
import pytest

from himo_tpu.core.categories import CATEGORY_TO_INDEX
from himo_tpu.eval.instance_metrics import InstanceMetrics, _bucket

CAR_IDX = CATEGORY_TO_INDEX["REGULAR_VEHICLE"]


def _frame(n_pts, speed, rng, instance=1):
    """One CAR instance moving at `speed` m/s, perfectly estimated."""
    pc = rng.uniform(-5, 5, size=(n_pts, 3)).astype(np.float32)
    gt_flow = np.tile([speed * 0.1, 0.0, 0.0], (n_pts, 1)).astype(np.float32)
    dt0 = rng.uniform(0, 0.1, size=n_pts).astype(np.float32)
    cats = np.full(n_pts, CAR_IDX, np.uint8)
    inst = np.full(n_pts, instance, np.uint32)
    return pc, gt_flow, dt0, cats, inst


class TestBuckets:
    def test_boundaries_half_open(self):
        assert _bucket(0.0) is None  # exactly 0 falls nowhere (eval.py:101)
        assert _bucket(0.001) == "0-10"
        assert _bucket(9.999) == "0-10"
        assert _bucket(10.0) == "10-20"
        assert _bucket(20.0) == "20-30"
        assert _bucket(30.0) == "30+"
        assert _bucket(500.0) == "30+"
        assert _bucket(-1.0) is None

    def test_min_points_filter(self, rng):
        m = InstanceMetrics("av2")
        pc, gt, dt0, cats, inst = _frame(9, 20.0, rng)  # < 10 points
        m.step(pc, gt, dt0, cats, inst, est_flow=gt)
        assert m.total_summary() is None  # instance skipped entirely

        pc, gt, dt0, cats, inst = _frame(10, 20.0, rng)  # exactly 10
        m.step(pc, gt, dt0, cats, inst, est_flow=gt)
        assert m.total_summary()["num_pts"] == 10

    def test_min_velocity_filter_av2_vs_scania(self, rng):
        for name, min_vel in (("av2", 3.0), ("scania", 1.5)):
            m = InstanceMetrics(name)
            pc, gt, dt0, cats, inst = _frame(50, min_vel - 0.1, rng)
            m.step(pc, gt, dt0, cats, inst, est_flow=gt)
            assert m.total_summary() is None, name
            pc, gt, dt0, cats, inst = _frame(50, min_vel + 0.1, rng)
            m.step(pc, gt, dt0, cats, inst, est_flow=gt)
            assert m.total_summary() is not None, name

    def test_point_weighted_total(self, rng):
        """Two instances in one frame: bucket averages weight by points."""
        m = InstanceMetrics("av2")
        pc1, gt1, dt01, cats1, inst1 = _frame(100, 15.0, rng, instance=1)
        pc2, gt2, dt02, cats2, inst2 = _frame(300, 15.0, rng, instance=2)
        # Instance 1 estimated with a constant flow error; instance 2 perfect.
        est1 = gt1 + np.array([0.4, 0, 0], np.float32)
        pc = np.concatenate([pc1, pc2])
        gt = np.concatenate([gt1, gt2])
        est = np.concatenate([est1, gt2])
        dt0 = np.concatenate([dt01, dt02])
        cats = np.concatenate([cats1, cats2])
        inst = np.concatenate([inst1, inst2])
        m.step(pc, gt, dt0, cats, inst, est_flow=est)
        total = m.total_summary()
        # MPE of instance 1 = mean(0.4/0.1 * dt0) = 4 * mean(dt0); weighted
        # 100/400 against a perfect 300-point instance.
        expected_inst1 = float(np.mean(4.0 * dt01))
        assert total["mpe"] == pytest.approx(expected_inst1 * 100 / 400, rel=1e-5)

    def test_zero_velocity_instance_warns_not_crashes(self, rng, capsys):
        m = InstanceMetrics("scania")
        # Velocity above min_vel cannot be 0; craft dis=0 instead: points at
        # origin make the DISTANCE bucket value 0 -> no bucket, with warning.
        pc = np.zeros((20, 3), np.float32)
        gt = np.tile([0.5, 0, 0], (20, 1)).astype(np.float32)  # 5 m/s
        dt0 = np.full(20, 0.05, np.float32)
        cats = np.full(20, CAR_IDX, np.uint8)
        inst = np.ones(20, np.uint32)
        m.step(pc, gt, dt0, cats, inst, est_flow=gt)
        out = capsys.readouterr().out
        assert "no bucket" in out
        # Velocity view still counted the instance.
        assert m.total_summary() is not None


class TestNaNPropagation:
    def test_empty_chamfer_is_nan_but_aggregation_survives(self):
        from himo_tpu.eval.chamfer import chamfer_distance_host

        assert np.isnan(chamfer_distance_host(np.zeros((0, 3)), np.ones((3, 3))))
