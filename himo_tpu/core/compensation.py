"""Motion-compensation math — the heart of HiMo, as pure jittable JAX.

Behavioral contract (reference citations into /root/reference):
- ``flow_to_comp_dis``: utils/__init__.py:36-43 — per-point flow (m / sweep)
  scaled by each point's intra-sweep time offset to the latest observation.
- ``refine_points``: utils/__init__.py:45-47 — de-skew by adding comp_dis.
- ``ego_points_mask``: utils/__init__.py:26-34 — True for points OUTSIDE the
  ego-vehicle box (default bounds are the Scania truck).
- ``pose_flow``: eval.py:284-285 — rigid ego-motion flow
  ``pc0 @ R^T + t - pc0`` with ``ego_pose = inv(pose1) @ pose0``.
- ``dt0_from_lidar_dt``: eval.py:299 — ``max(lidar_dt) - lidar_dt``; points are
  compensated *to the latest observation* in the sweep.
- ``evaluation_mask``: eval.py:288-296 — 2-D range gate & not-ground & outside
  ego box (& flow-valid for Scania).

All functions accept an optional ``valid`` mask so they stay correct on
fixed-size padded arrays (XLA static shapes). Padded entries never influence
reductions (the sweep max in ``dt0_from_lidar_dt``) and are masked out of
boolean outputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# 2-D range gate for evaluation, matching the AV2 scene-flow eval constant
# consumed at reference eval.py:288-289 (av2 devkit CLOSE_DISTANCE_THRESHOLD).
CLOSE_DISTANCE_THRESHOLD: float = 35.0

# Ego-vehicle exclusion boxes: (min_bound, max_bound).
# Scania truck default: reference utils/__init__.py:26 (note 2.760004/2 == 1.380002).
SCANIA_EGO_BOX = (
    (-9.5, -1.5, 0.0),
    (5.0, 1.380002, 5.0),
)
# AV2 ego box override: reference eval.py:296.
AV2_EGO_BOX = (
    (-1.5, -1.5, -2.0),
    (1.5, 1.5, 2.0),
)


def flow_to_comp_dis(
    flow: jax.Array, dt0: jax.Array, sensor_dt: float = 0.1
) -> jax.Array:
    """Scale per-sweep scene flow into per-point compensation distances.

    Args:
        flow: (N, 3) motion flow in meters per sweep (ego-motion removed).
        dt0: (N,) seconds from each point's capture time to the latest
            observation of the sweep (``max(lidar_dt) - lidar_dt``).
        sensor_dt: sweep period in seconds (0.1 s for a 10 Hz sensor).

    Returns:
        (N, 3) compensation displacement ``flow / sensor_dt * dt0``.
    """
    return flow * (dt0 / sensor_dt)[:, None]


def refine_points(pc: jax.Array, comp_dis: jax.Array) -> jax.Array:
    """De-skew a point cloud: ``pc[:, :3] + comp_dis``."""
    return pc[:, :3] + comp_dis


def ego_points_mask(
    pts: jax.Array,
    min_bound=SCANIA_EGO_BOX[0],
    max_bound=SCANIA_EGO_BOX[1],
) -> jax.Array:
    """True for points strictly OUTSIDE the axis-aligned ego-vehicle box."""
    lo = jnp.asarray(min_bound, dtype=pts.dtype)
    hi = jnp.asarray(max_bound, dtype=pts.dtype)
    inside = jnp.all((pts[:, :3] > lo) & (pts[:, :3] < hi), axis=-1)
    return ~inside


def relative_se3(pose0: jax.Array, pose1: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(R, t) of ``inv(pose1) @ pose0`` via the analytic SE(3) inverse.

    ``inv([R1, t1]) = [R1^T, -R1^T t1]`` — exact and cheap, avoiding a generic
    4x4 LU inverse whose accelerator implementation may run at reduced
    precision. Tiny matmuls run at HIGHEST precision (fp32 accumulate).
    """
    r0, t0 = pose0[:3, :3], pose0[:3, 3]
    r1, t1 = pose1[:3, :3], pose1[:3, 3]
    rot = jnp.matmul(r1.T, r0, precision=jax.lax.Precision.HIGHEST)
    t = jnp.matmul(r1.T, (t0 - t1)[:, None], precision=jax.lax.Precision.HIGHEST)[:, 0]
    return rot, t


def pose_flow(pc0: jax.Array, pose0: jax.Array, pose1: jax.Array) -> jax.Array:
    """Rigid flow induced by ego motion between two poses.

    ``ego_pose = inv(pose1) @ pose0``; flow = ``pc0 @ R^T + t - pc0``.
    Matches reference eval.py:284-285.
    """
    rot, t = relative_se3(pose0, pose1)
    rot = rot.astype(pc0.dtype)
    t = t.astype(pc0.dtype)
    xyz = pc0[:, :3]
    return (
        jnp.matmul(xyz, rot.T, precision=jax.lax.Precision.HIGHEST) + t - xyz
    )


def dt0_from_lidar_dt(lidar_dt: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Per-point time gap to the LATEST observation: ``max(lidar_dt) - lidar_dt``.

    With a ``valid`` mask, the max ignores padded entries and padded outputs
    are zeroed, so padding cannot perturb real points.
    """
    if valid is None:
        return jnp.max(lidar_dt) - lidar_dt
    neg_inf = jnp.asarray(-jnp.inf, lidar_dt.dtype)
    sweep_end = jnp.max(jnp.where(valid, lidar_dt, neg_inf))
    return jnp.where(valid, sweep_end - lidar_dt, 0.0)


@partial(jax.jit, static_argnames=("dataset",))
def evaluation_mask(
    pc0: jax.Array,
    ground_mask: jax.Array,
    flow_is_valid: jax.Array | None = None,
    dataset: str = "av2",
    valid: jax.Array | None = None,
) -> jax.Array:
    """Points eligible for metric evaluation.

    ``within 2-D CLOSE_DISTANCE_THRESHOLD  &  not ground  &  outside ego box``
    plus ``flow_is_valid`` for Scania (reference eval.py:288-296).
    """
    dis = jnp.linalg.norm(pc0[:, :2], axis=-1)
    mask = (dis <= CLOSE_DISTANCE_THRESHOLD) & (~ground_mask)
    if dataset == "scania":
        mask &= ego_points_mask(pc0)
        if flow_is_valid is not None:
            mask &= flow_is_valid
    else:
        mask &= ego_points_mask(pc0, *AV2_EGO_BOX)
    if valid is not None:
        mask &= valid
    return mask
