"""Native C++ runtime library: KD-tree, chamfer, raw reader, packer."""

import numpy as np
import pytest

from himo_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


def test_kdtree_matches_scipy(rng):
    from scipy.spatial import cKDTree

    ref = rng.normal(scale=10, size=(4000, 3)).astype(np.float32)
    q = rng.normal(scale=10, size=(1500, 3)).astype(np.float32)
    d_scipy, i_scipy = cKDTree(ref).query(q, k=1)
    d_nat, i_nat = native.KDTree(ref).query(q)
    np.testing.assert_allclose(d_nat, d_scipy, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_nat, i_scipy)


def test_kdtree_knn_matches_scipy(rng):
    from scipy.spatial import cKDTree

    ref = rng.normal(scale=10, size=(4000, 3)).astype(np.float32)
    q = rng.normal(scale=10, size=(1500, 3)).astype(np.float32)
    for k in (2, 6, 8):
        d_scipy, i_scipy = cKDTree(ref).query(q, k=k)
        d_nat, i_nat = native.KDTree(ref).query(q, k=k)
        np.testing.assert_allclose(d_nat, d_scipy, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i_nat, i_scipy)


def test_kdtree_knn_fewer_points_than_k():
    pts = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    d, i = native.KDTree(pts).query(np.zeros((1, 3), np.float32), k=5)
    assert d.shape == (1, 5) and i.shape == (1, 5)
    np.testing.assert_allclose(d[0, :3], [0.0, 1.0, 2.0], atol=1e-6)
    assert (i[0, 3:] == -1).all() and np.isinf(d[0, 3:]).all()


def test_chamfer_matches_scipy(rng):
    from scipy.spatial import cKDTree

    a = rng.normal(size=(2000, 3)).astype(np.float32)
    b = rng.normal(size=(3000, 3)).astype(np.float32)
    d12, _ = cKDTree(b).query(a, k=1)
    d21, _ = cKDTree(a).query(b, k=1)
    expected = (d12.mean() + d21.mean()) / 2
    assert native.chamfer(a, b) == pytest.approx(expected, rel=1e-7)


def test_chamfer_empty_returns_nan():
    a = np.zeros((0, 3), np.float32)
    b = np.ones((5, 3), np.float32)
    assert np.isnan(native.chamfer(a, b))


def test_read_attr_roundtrip(tmp_path, rng):
    f32 = rng.normal(size=1000).astype(np.float32)
    f32.tofile(tmp_path / "x.bin")
    got = native.read_attr(tmp_path / "x.bin", "float32")
    np.testing.assert_array_equal(got, f32)

    i8 = rng.integers(-5, 5, size=777).astype(np.int8)
    i8.tofile(tmp_path / "s.bin")
    got8 = native.read_attr(tmp_path / "s.bin", "int8")
    np.testing.assert_array_equal(got8, i8.astype(np.int32))


def test_preload_files(tmp_path, rng):
    """io_uring (or fadvise-fallback) cache warming reads every byte."""
    sizes = [1 << 12, (1 << 20) + 137, 3 << 20]
    paths = []
    for i, sz in enumerate(sizes):
        p = tmp_path / f"scene_{i}.h5"
        p.write_bytes(bytes(rng.integers(0, 256, sz, dtype=np.uint8)))
        paths.append(p)
    got = native.preload_files(paths)
    assert got == sum(sizes)
    # Missing files are skipped, not fatal.
    assert native.preload_files([tmp_path / "nope.h5"]) == 0


def test_pack_frames(rng):
    frames = [
        rng.normal(size=(n, 4)).astype(np.float32) for n in (100, 250, 64)
    ]
    batch, valid = native.pack_frames(frames, target=256)
    assert batch.shape == (3, 256, 4)
    np.testing.assert_array_equal(valid.sum(axis=1), [100, 250, 64])
    np.testing.assert_array_equal(batch[0, :100], frames[0])
    np.testing.assert_array_equal(batch[0, 100:], 0)
    # Oversized frame truncates.
    np.testing.assert_array_equal(batch[1, :250], frames[1][:250])
