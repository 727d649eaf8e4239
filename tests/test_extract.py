"""Raw Scania extraction + GT autolabeling, end to end on synthetic raw data."""

import json
import pickle

import numpy as np
import pytest


def _write_raw_scene(root, scene_id="batch_7", num_frames=3, n_points=800, seed=0):
    """Synthetic raw superframe folders + sequence JSON + pseudo-label pkl."""
    rng = np.random.default_rng(seed)
    scene = root / scene_id
    superframes = []
    metadata = []
    obj_center = np.array([12.0, 2.0, 1.0])
    obj_vel = np.array([10.0, 0.0])
    for i in range(num_frames):
        name = f"superframe_{i + 1:05d}"
        folder = scene / name
        folder.mkdir(parents=True)
        # Background + one moving box (1-based sensor ids like the raw rigs).
        n_obj = 120
        bg = rng.uniform(-30, 30, size=(n_points - n_obj, 3))
        bg[:, 2] = rng.uniform(0.2, 3.0, size=n_points - n_obj)
        center_i = obj_center + np.array([*obj_vel, 0.0]) * 0.1 * i
        obj = center_i + rng.uniform(-1, 1, size=(n_obj, 3)) * [2.0, 1.0, 0.75]
        pts = np.concatenate([bg, obj]).astype(np.float32)
        prefix = folder / name
        pts[:, 0].tofile(f"{prefix}_X.bin")
        pts[:, 1].tofile(f"{prefix}_Y.bin")
        pts[:, 2].tofile(f"{prefix}_Z.bin")
        rng.random(n_points).astype(np.float32).tofile(f"{prefix}_W.bin")
        rng.integers(1, 4, size=n_points).astype(np.int8).tofile(
            f"{prefix}_sensor.bin"
        )
        rng.integers(0, int(1e8), size=n_points).astype(np.int32).tofile(
            f"{prefix}_deltaT.bin"
        )
        superframes.append(
            {
                "timestamp_epoch_ns": int(1e18 + i * 1e8),
                "smoothPosition": {
                    "smothYaw_rad": 0.0,
                    "smoothX_m": 5.0 * i,
                    "smoothY_m": 0.0,
                },
            }
        )
        metadata.append(
            {
                "sample_idx": scene_id,
                "annos": {
                    "location": (center_i + [0, 0, 0.0]).reshape(1, 3),
                    "dimensions": np.array([[4.5, 2.2, 1.6]]),
                    "heading": np.array([0.0]),
                    "speed": np.array([np.linalg.norm(obj_vel)]),
                    "velocity": obj_vel.reshape(1, 2),
                    "name": ["car"],
                    "mean_delta_t": 0.05,
                },
            }
        )
    seq = {
        "vehicle": "testtruck",
        "superframes": superframes,
        "lidars": {f"lidar{i}": {"name": f"L{i}"} for i in range(3)},
    }
    (scene / f"sequence_{7}.json").write_text(json.dumps(seq))
    pkl = root / "pseudo_infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(metadata, f)
    return pkl


def test_extract_pipeline(tmp_path):
    import h5py

    from himo_tpu.cli.extract_scania import main as extract_main
    from himo_tpu.data.dataset import SceneFlowDataset

    raw = tmp_path / "raw"
    raw.mkdir()
    pkl = _write_raw_scene(raw)
    out = tmp_path / "scania_out"
    extract_main(
        origin_data=str(raw),
        metadata_pkl=str(pkl),
        output_dir=str(out),
        nproc=1,
    )
    assert (out / "batch_7.h5").exists()
    assert (out / "index_total.pkl").exists()

    with h5py.File(out / "batch_7.h5", "r") as f:
        keys = sorted(f.keys())
        assert len(keys) == 3
        g = f[keys[0]]
        for key in (
            "lidar",
            "lidar_id",
            "lidar_dt",
            "pose",
            "timestamp",
            "flow",
            "flow_is_valid",
            "flow_category_indices",
            "flow_instance_id",
            "ego_motion",
        ):
            assert key in g, key
        # Object points: car category (REGULAR_VEHICLE=19), instance 1.
        classes = g["flow_category_indices"][()]
        inst = g["flow_instance_id"][()]
        assert (inst > 0).sum() > 50
        from himo_tpu.core.categories import CATEGORY_TO_INDEX

        assert set(classes[inst > 0]) == {CATEGORY_TO_INDEX["REGULAR_VEHICLE"]}
        # Flow on the object = pose flow + 10 m/s * 0.1 s in x.
        flow = g["flow"][()]
        pose0 = g["pose"][()]
        pose1 = f[keys[1]]["pose"][()]
        xyz = g["lidar"][:, :3]
        ego = np.linalg.inv(pose1) @ pose0
        pose_flow = xyz @ ego[:3, :3].T + ego[:3, 3] - xyz
        motion = flow - pose_flow
        np.testing.assert_allclose(
            motion[inst > 0],
            np.tile([1.0, 0.0, 0.0], (int((inst > 0).sum()), 1)),
            atol=1e-3,
        )
        np.testing.assert_allclose(motion[inst == 0], 0.0, atol=1e-3)

    # The extracted scenes feed the standard dataset reader.
    ds = SceneFlowDataset(out)
    assert len(ds) == 3
    item = ds[0]
    assert item["pc0"].shape[1] == 4
    # Last frame of the extraction has no flow (no successor metadata).
    assert "flow" in item


def test_extract_idempotent_skip(tmp_path, capsys):
    from himo_tpu.cli.extract_scania import main as extract_main

    raw = tmp_path / "raw"
    raw.mkdir()
    pkl = _write_raw_scene(raw)
    out = tmp_path / "scania_out"
    extract_main(origin_data=str(raw), metadata_pkl=str(pkl), output_dir=str(out), nproc=1)
    extract_main(origin_data=str(raw), metadata_pkl=str(pkl), output_dir=str(out), nproc=1)
    assert "already exists" in capsys.readouterr().out


def test_repack_tool(tmp_path):
    import h5py

    from himo_tpu.cli.repack_h5 import main as repack_main
    from himo_tpu.data.synthetic import make_dataset

    root = tmp_path / "av2_repack"
    make_dataset(root, num_scenes=1, num_frames=2, seed=1)
    # Inject legacy keys.
    path = next(root.glob("*.h5"))
    with h5py.File(path, "a") as f:
        for key in f:
            g = f[key]
            g.create_dataset("SensorsCenter", data=np.zeros((3, 3), np.float32))
            g.create_dataset("legacy_junk", data=np.zeros(4))
    changed = repack_main(data_dir=str(root), drop_keys=["legacy_junk"])
    assert changed > 0
    with h5py.File(path, "r") as f:
        for key in f:
            g = f[key]
            assert "SensorsCenter" not in g
            assert "legacy_junk" not in g
            assert g["lidar_center"].shape[-2:] == (4, 4)
