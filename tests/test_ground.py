"""Ground classification op tests."""

import numpy as np

from himo_tpu.ops.ground import GroundConfig, ground_mask


def _scene(rng, n_ground=2000, n_obj=300):
    gx = rng.uniform(-40, 40, size=n_ground)
    gy = rng.uniform(-40, 40, size=n_ground)
    gz = rng.normal(0.0, 0.04, size=n_ground)  # flat road
    ground = np.stack([gx, gy, gz], axis=1).astype(np.float32)
    # A box object standing on the ground.
    obj = np.stack(
        [
            rng.uniform(5, 9, size=n_obj),
            rng.uniform(-1, 1, size=n_obj),
            rng.uniform(0.4, 2.0, size=n_obj),
        ],
        axis=1,
    ).astype(np.float32)
    return ground, obj


def test_separates_ground_from_objects(rng):
    ground, obj = _scene(rng)
    pts = np.concatenate([ground, obj])
    mask = np.asarray(ground_mask(pts))
    assert mask[: len(ground)].mean() > 0.9
    assert mask[len(ground) :].mean() < 0.1


def test_occluded_cell_inherits_neighbor_floor(rng):
    """A cell containing ONLY elevated points must not call them ground."""
    ground, _ = _scene(rng)
    # Elevated cluster in a cell with no road returns under it.
    roof = np.stack(
        [
            rng.uniform(20.0, 21.5, size=50),
            rng.uniform(20.0, 21.5, size=50),
            np.full(50, 1.8),
        ],
        axis=1,
    ).astype(np.float32)
    # Ensure neighbors have road points.
    pts = np.concatenate([ground, roof])
    mask = np.asarray(ground_mask(pts))
    assert mask[len(ground) :].mean() < 0.2


def test_out_of_grid_points_not_ground(rng):
    pts = np.array([[500.0, 0.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
    # Single in-grid point at z=0 is its own cell floor -> ground.
    mask = np.asarray(ground_mask(pts))
    assert not mask[0]
    assert mask[1]


def test_extraction_writes_ground_mask(tmp_path):
    import h5py

    from himo_tpu.cli.extract_scania import main as extract_main
    from tests.test_extract import _write_raw_scene

    raw = tmp_path / "raw"
    raw.mkdir()
    pkl = _write_raw_scene(raw)
    out = tmp_path / "scania_gm"
    extract_main(origin_data=str(raw), metadata_pkl=str(pkl), output_dir=str(out), nproc=1)
    with h5py.File(out / "batch_7.h5", "r") as f:
        key = sorted(f.keys())[0]
        assert "ground_mask" in f[key]
        gm = f[key]["ground_mask"][()]
        assert gm.dtype == np.bool_
