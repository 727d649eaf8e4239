"""Exact numpy parity tests for the core compensation math.

The expected values re-state the reference formulas
(/root/reference/utils/__init__.py:26-47, eval.py:284-299) directly in numpy.
"""

import numpy as np
import pytest

from himo_tpu.core.compensation import (
    AV2_EGO_BOX,
    dt0_from_lidar_dt,
    ego_points_mask,
    flow_to_comp_dis,
    pose_flow,
    refine_points,
)


def test_flow_to_comp_dis_matches_reference_formula(rng):
    flow = rng.normal(size=(100, 3)).astype(np.float32)
    dt0 = rng.uniform(0, 0.1, size=100).astype(np.float32)
    got = np.asarray(flow_to_comp_dis(flow, dt0, sensor_dt=0.1))
    expected = flow / 0.1 * dt0[:, None]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_refine_points_adds_displacement(rng):
    pc = rng.normal(size=(50, 4)).astype(np.float32)
    ds = rng.normal(size=(50, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(refine_points(pc, ds)), pc[:, :3] + ds)


def test_ego_points_mask_scania_default():
    pts = np.array(
        [
            [0.0, 0.0, 1.0],  # inside the Scania truck box
            [-10.0, 0.0, 1.0],  # behind the box
            [0.0, 0.0, 6.0],  # above the box
            [4.9, 1.3, 4.9],  # just inside
            [5.1, 0.0, 1.0],  # just outside +x
        ],
        dtype=np.float32,
    )
    got = np.asarray(ego_points_mask(pts))
    np.testing.assert_array_equal(got, [False, True, True, False, True])


def test_ego_points_mask_av2_override():
    pts = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], dtype=np.float32)
    got = np.asarray(ego_points_mask(pts, *AV2_EGO_BOX))
    np.testing.assert_array_equal(got, [False, True])


def test_pose_flow_matches_numpy_reference(rng):
    pc0 = rng.normal(scale=20, size=(200, 3)).astype(np.float32)
    yaw0, yaw1 = 0.1, 0.15

    def pose(yaw, x, y):
        c, s = np.cos(yaw), np.sin(yaw)
        p = np.eye(4)
        p[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        p[0, 3], p[1, 3] = x, y
        return p

    pose0, pose1 = pose(yaw0, 1.0, 2.0), pose(yaw1, 2.5, 2.2)
    got = np.asarray(pose_flow(pc0, pose0, pose1))
    ego = np.linalg.inv(pose1) @ pose0
    expected = pc0 @ ego[:3, :3].T + ego[:3, 3] - pc0
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dt0_basic(rng):
    dt = rng.uniform(0, 0.1, size=64).astype(np.float32)
    got = np.asarray(dt0_from_lidar_dt(dt))
    np.testing.assert_allclose(got, dt.max() - dt, rtol=1e-6)


def test_dt0_ignores_padding():
    dt = np.array([0.00, 0.05, 0.08, 99.0, 99.0], dtype=np.float32)
    valid = np.array([True, True, True, False, False])
    got = np.asarray(dt0_from_lidar_dt(dt, valid))
    np.testing.assert_allclose(got[:3], 0.08 - dt[:3], rtol=1e-6)
    np.testing.assert_allclose(got[3:], 0.0)


def test_comp_dis_collapses_distortion():
    """A point captured at dt with velocity v needs exactly v * dt0 to reach
    its sweep-end position — comp_dis of the true flow undoes the skew."""
    v = np.array([20.0, -3.0, 0.0], dtype=np.float32)
    dt = np.array([0.0, 0.03, 0.07, 0.1], dtype=np.float32)
    base = np.array([10.0, 5.0, 1.0], dtype=np.float32)
    skewed = base[None, :] + v[None, :] * dt[:, None]
    flow = np.tile(v * 0.1, (4, 1))
    dt0 = dt.max() - dt
    refined = np.asarray(refine_points(skewed, flow_to_comp_dis(flow, dt0, 0.1)))
    expected = np.tile(base + v * dt.max(), (4, 1))
    np.testing.assert_allclose(refined, expected, rtol=1e-5, atol=1e-5)
