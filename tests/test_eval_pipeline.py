"""End-to-end evaluation on synthetic scenes with analytically known answers."""

import json

import numpy as np
import pytest

from himo_tpu.cli.eval import main as eval_main
from himo_tpu.data.dataset import SceneFlowDataset
from himo_tpu.eval.pipeline import prepare_frame


def test_dataset_surface(synthetic_dataset):
    ds = SceneFlowDataset(synthetic_dataset, vis_name="perfect", eval=True)
    assert len(ds) == 2 * 3  # 2 scenes x (4 frames - final frame)
    item = ds[0]
    for key in (
        "pc0",
        "pose0",
        "pose1",
        "flow",
        "gm0",
        "lidar_dt",
        "flow_is_valid",
        "flow_category_indices",
        "flow_instance_id",
        "scene_id",
        "timestamp",
        "perfect",
    ):
        assert key in item, key
    assert item["pc0"].shape[1] == 4
    assert item["flow"].shape == (len(item["pc0"]), 3)


def test_gt_flow_is_pure_object_motion(synthetic_dataset):
    """flow - pose_flow must equal object velocity * sweep_dt on objects and
    ~0 on static background."""
    ds = SceneFlowDataset(synthetic_dataset, eval=True)
    data = ds[0]
    frame = prepare_frame(data, "av2")
    inst = data["flow_instance_id"]
    bg = inst == 0
    np.testing.assert_allclose(frame["gt_flow"][bg], 0.0, atol=1e-4)
    obj1 = inst == 1  # REGULAR_VEHICLE at 22 m/s
    speeds = np.linalg.norm(frame["gt_flow"][obj1], axis=1) / 0.1
    assert np.all(np.abs(speeds - np.linalg.norm([22.0, 0.5, 0.0])) < 0.2)


def test_eval_perfect_flow_scores_zero(synthetic_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    metrics = eval_main(data_dir=str(synthetic_dataset), res_name="perfect")
    total = metrics.total_summary()
    assert total is not None
    assert total["mpe"] < 1e-5
    assert total["cd"] < 1e-5
    assert total["num_pts"] > 0
    # JSON report written with the nested structure.
    report = json.loads((tmp_path / "res-av2.json").read_text())
    assert "av2" in report and "perfect" in report["av2"]
    car = report["av2"]["perfect"]["CAR"]
    assert set(car) == {"overall", "velocity", "distance"}
    assert set(car["velocity"]) == {"0-10", "10-20", "20-30", "30+"}


def test_eval_ranking_raw_worse_than_noisy_worse_than_perfect(
    synthetic_dataset, tmp_path, monkeypatch
):
    monkeypatch.chdir(tmp_path)
    res = {}
    for name in ("perfect", "noisy", "raw"):
        res[name] = eval_main(data_dir=str(synthetic_dataset), res_name=name).total_summary()
    assert res["perfect"]["mpe"] < res["noisy"]["mpe"] < res["raw"]["mpe"]
    assert res["perfect"]["cd"] < res["raw"]["cd"]
    # Objects at 22 m/s & 15 m/s with dt0 up to 0.1 s -> raw MPE order ~1 m.
    assert res["raw"]["mpe"] > 0.3


def test_velocity_bucketing(synthetic_dataset, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    metrics = eval_main(data_dir=str(synthetic_dataset), res_name="raw")
    car = metrics.category_summary("CAR")
    # The car moves at ~22 m/s -> all its instances fall in the 20-30 bucket.
    assert car["velocity"]["20-30"]["num_obj"] > 0
    assert car["velocity"]["0-10"]["num_obj"] == 0
    other = metrics.category_summary("OTHER_VEHICLES")
    # The truck moves at 15 m/s -> 10-20 bucket.
    assert other["velocity"]["10-20"]["num_obj"] > 0


def test_distance_bucket_strict_parity_quirk():
    """Pin the DELIBERATE deviation from the reference's eval.py:94: distance
    buckets use the xyz norm by default; ``strict_parity=True`` reproduces
    the reference's norm over ALL pc columns (including intensity)."""
    import numpy as np

    from himo_tpu.core.categories import CATEGORY_TO_INDEX
    from himo_tpu.eval.instance_metrics import InstanceMetrics

    n = 20
    rng = np.random.default_rng(0)
    # Instance at xyz distance ~9 m with intensity 40: xyz-norm buckets it
    # 0-10; the reference 4-column norm says sqrt(9^2 + 40^2) ~ 41 -> 30+.
    xyz = rng.normal(scale=0.2, size=(n, 3)).astype(np.float32) + [9.0, 0, 0]
    pc = np.concatenate([xyz, np.full((n, 1), 40.0, np.float32)], axis=1)
    gt_flow = np.tile(np.float32([0.5, 0.0, 0.0]), (n, 1))  # 5 m/s
    dt0 = np.full(n, 0.05, np.float32)
    cats = np.full(n, CATEGORY_TO_INDEX["REGULAR_VEHICLE"], np.int32)
    inst = np.ones(n, np.int32)

    def run(strict):
        m = InstanceMetrics("av2", strict_parity=strict)
        m.step(
            pc=pc if strict else pc[:, :3],
            gt_flow=gt_flow,
            dt0=dt0,
            category_indices=cats,
            instance_ids=inst,
            est_flow=np.zeros_like(gt_flow),
        )
        return m.category_summary("CAR")["distance"]

    default = run(False)
    strict = run(True)
    assert default["0-10"]["num_obj"] == 1 and default["30+"]["num_obj"] == 0
    assert strict["0-10"]["num_obj"] == 0 and strict["30+"]["num_obj"] == 1
