"""AV2 raw-log ingestion: synthetic log fixture -> .h5 with analytic flow."""

import numpy as np
import pandas as pd
import pytest


def _yaw_quat(yaw):
    return np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)


def _write_av2_log(root, log_id="log_abc", num_frames=3, n_bg=1200, seed=0):
    """Ego moving +x at 10 m/s; one car track moving +y at 8 m/s."""
    rng = np.random.default_rng(seed)
    log = root / log_id
    lidar_dir = log / "sensors" / "lidar"
    lidar_dir.mkdir(parents=True)

    ts0 = 315966070819970000
    dt_ns = 100_000_000
    ego_speed = 10.0
    car_center_city = np.array([20.0, 5.0, 1.0])
    car_vel = np.array([0.0, 8.0, 0.0])
    car_dims = np.array([4.5, 2.0, 1.5])

    poses, annos = [], []
    for i in range(num_frames):
        ts = ts0 + i * dt_ns
        t = i * 0.1
        ego_xyz = np.array([ego_speed * t, 0.0, 0.0])
        qw, qx, qy, qz = _yaw_quat(0.0)
        poses.append(
            dict(timestamp_ns=ts, qw=qw, qx=qx, qy=qy, qz=qz,
                 tx_m=ego_xyz[0], ty_m=ego_xyz[1], tz_m=ego_xyz[2])
        )
        car_city = car_center_city + car_vel * t
        car_ego = car_city - ego_xyz  # identity ego rotation
        annos.append(
            dict(timestamp_ns=ts, track_uuid="car-1", category="REGULAR_VEHICLE",
                 length_m=car_dims[0], width_m=car_dims[1], height_m=car_dims[2],
                 qw=qw, qx=qx, qy=qy, qz=qz,
                 tx_m=car_ego[0], ty_m=car_ego[1], tz_m=car_ego[2],
                 num_interior_pts=100)
        )

        # Sweep: static background (city) + car surface points, in ego frame.
        bg_city = rng.uniform(-30, 60, size=(n_bg, 3))
        bg_city[:, 2] = rng.uniform(0.2, 4.0, size=n_bg)
        car_local = rng.uniform(-0.5, 0.5, size=(150, 3)) * car_dims
        car_pts_city = car_city + car_local
        pts_city = np.concatenate([bg_city, car_pts_city])
        pts_ego = (pts_city - ego_xyz).astype(np.float32)
        n = len(pts_ego)
        pd.DataFrame(
            {
                "x": pts_ego[:, 0],
                "y": pts_ego[:, 1],
                "z": pts_ego[:, 2],
                "intensity": rng.random(n).astype(np.float32),
                "laser_number": rng.integers(0, 32, n).astype(np.uint8),
                "offset_ns": rng.integers(0, int(1e8), n).astype(np.int64),
            }
        ).to_feather(lidar_dir / f"{ts}.feather")

    pd.DataFrame(poses).to_feather(log / "city_SE3_egovehicle.feather")
    pd.DataFrame(annos).to_feather(log / "annotations.feather")
    return log, n_bg


def test_av2_extraction_end_to_end(tmp_path):
    import h5py

    from himo_tpu.cli.extract_av2 import main as extract_main
    from himo_tpu.core.categories import CATEGORY_TO_INDEX
    from himo_tpu.data.dataset import SceneFlowDataset
    from himo_tpu.eval.pipeline import prepare_frame

    raw = tmp_path / "raw"
    raw.mkdir()
    _write_av2_log(raw)
    out = tmp_path / "av2_h5"
    extract_main(origin_data=str(raw), output_dir=str(out), nproc=1)

    assert (out / "log_abc.h5").exists()
    with h5py.File(out / "log_abc.h5", "r") as f:
        assert len(f.keys()) == 3
        key = sorted(f.keys())[0]
        g = f[key]
        assert "ground_mask" in g
        inst = g["flow_instance_id"][()]
        classes = g["flow_category_indices"][()]
        assert (inst > 0).sum() >= 100  # the car's points
        assert set(classes[inst > 0]) == {CATEGORY_TO_INDEX["REGULAR_VEHICLE"]}

    # The motion flow of car points must be ~0.8 m in +y; background ~0.
    ds = SceneFlowDataset(out)
    data = ds[0]
    frame = prepare_frame(data, "av2")
    inst = data["flow_instance_id"]
    car = inst > 0
    np.testing.assert_allclose(
        frame["gt_flow"][car],
        np.tile([0.0, 0.8, 0.0], (int(car.sum()), 1)),
        atol=1e-3,
    )
    np.testing.assert_allclose(frame["gt_flow"][~car], 0.0, atol=1e-3)
    assert data["flow_is_valid"].all()


def test_av2_vanished_track_invalidates(tmp_path):
    import h5py

    from himo_tpu.data.av2 import process_log

    raw = tmp_path / "raw"
    raw.mkdir()
    log, n_bg = _write_av2_log(raw, num_frames=2)
    # Remove the annotation at the SECOND frame: the track vanishes.
    df = pd.read_feather(log / "annotations.feather")
    ts_last = df["timestamp_ns"].max()
    df[df.timestamp_ns != ts_last].to_feather(log / "annotations.feather")

    out = tmp_path / "out"
    process_log(log, out)
    with h5py.File(out / "log_abc.h5", "r") as f:
        key = sorted(f.keys())[0]
        valid = f[key]["flow_is_valid"][()]
        inst = f[key]["flow_instance_id"][()]
        assert not valid[inst > 0].any()
        assert valid[inst == 0].all()
