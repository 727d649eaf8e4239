"""Distance-transform op tests."""

import numpy as np
import pytest

from himo_tpu.ops.dt import DTConfig, distance_transform, sample_dt


SMALL = DTConfig(
    x_range=(-8.0, 8.0),
    y_range=(-8.0, 8.0),
    z_range=(-2.0, 2.0),
    voxel_size=(0.5, 0.5, 0.5),
)


def test_grid_shape():
    assert SMALL.grid_shape == (32, 32, 8)


def test_dt_matches_brute_force(rng):
    pts = rng.uniform(-7, 7, size=(50, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.5, 1.5, size=50)
    grid = distance_transform(pts, config=SMALL)
    d = np.asarray(grid.dist_sq)
    # Brute force against cell centers of occupied cells.
    ox, oy, oz = SMALL.origin
    vx, vy, vz = SMALL.voxel_size
    occ_idx = np.unique(
        np.stack(
            [
                np.floor((pts[:, 0] - ox) / vx),
                np.floor((pts[:, 1] - oy) / vy),
                np.floor((pts[:, 2] - oz) / vz),
            ],
            axis=1,
        ).astype(int),
        axis=0,
    )
    gx, gy, gz = SMALL.grid_shape
    xs = (np.arange(gx) + 0.5) * vx + ox
    ys = (np.arange(gy) + 0.5) * vy + oy
    zs = (np.arange(gz) + 0.5) * vz + oz
    centers = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    occ_centers = np.stack(
        [(occ_idx[:, 0] + 0.5) * vx + ox, (occ_idx[:, 1] + 0.5) * vy + oy,
         (occ_idx[:, 2] + 0.5) * vz + oz], axis=1
    )
    diff = centers[..., None, :] - occ_centers[None, None, None, :, :]
    brute = (diff**2).sum(-1).min(-1)
    np.testing.assert_allclose(d, brute, rtol=1e-4, atol=1e-4)


def test_sample_at_point_location_is_small(rng):
    pts = rng.uniform(-6, 6, size=(100, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    grid = distance_transform(pts, config=SMALL)
    d2 = np.asarray(sample_dt(grid, pts))
    # Half-voxel quantization + trilinear mixing of neighbor cells bounds the
    # error at a cloud point by roughly the voxel diagonal squared.
    assert d2.max() < 3 * 0.5**2


def test_sample_far_from_cloud_is_large():
    pts = np.zeros((10, 3), dtype=np.float32)
    grid = distance_transform(pts, config=SMALL)
    far = np.array([[6.0, 6.0, 1.0]], dtype=np.float32)
    d2 = float(np.asarray(sample_dt(grid, far))[0])
    true = 6.0**2 + 6.0**2 + 1.0**2
    assert d2 == pytest.approx(true, rel=0.1)


def test_gradient_points_toward_cloud(rng):
    import jax
    import jax.numpy as jnp

    pts = np.zeros((10, 3), dtype=np.float32)
    grid = distance_transform(pts, config=SMALL)

    def loss(q):
        return jnp.sum(sample_dt(grid, q))

    q = jnp.asarray([[3.0, 0.0, 0.0]])
    g = np.asarray(jax.grad(loss)(q))
    assert g[0, 0] > 0  # moving +x increases distance from origin cloud
