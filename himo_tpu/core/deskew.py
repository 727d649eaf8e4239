"""The de-skew pipeline as one fused, batched, jittable device function.

The reference computes pose flow, masks, dt0 and comp_dis in per-frame numpy
loops (eval.py:281-310, save_zip.py:112-123). Here the whole per-point
pipeline is a single XLA program over fixed-size padded clouds, vmappable over
a batch of frames and shardable over a device mesh — this is the fleet-scale
throughput path (SURVEY.md §7 step 5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from himo_tpu.core.compensation import (
    AV2_EGO_BOX,
    CLOSE_DISTANCE_THRESHOLD,
    SCANIA_EGO_BOX,
    dt0_from_lidar_dt,
    ego_points_mask,
    flow_to_comp_dis,
    relative_se3,
)


class DeskewResult(NamedTuple):
    comp_dis: jax.Array  # (N, 3) compensation displacement
    refined: jax.Array  # (N, 3) de-skewed points
    motion_flow: jax.Array  # (N, 3) flow with ego motion removed
    eval_mask: jax.Array  # (N,) metric-eligible points
    dt0: jax.Array  # (N,) time gap to latest observation


@partial(jax.jit, static_argnames=("dataset", "sensor_dt"))
def deskew_frame(
    pc0: jax.Array,
    lidar_dt: jax.Array,
    valid: jax.Array,
    pose0: jax.Array,
    pose1: jax.Array,
    est_flow: jax.Array,
    ground_mask: jax.Array,
    flow_is_valid: jax.Array | None = None,
    dataset: str = "av2",
    sensor_dt: float = 0.1,
) -> DeskewResult:
    """Fully fused per-frame de-skew.

    Args:
        pc0: (N, >=3) padded point cloud in ego0 frame.
        lidar_dt: (N,) intra-sweep capture offsets (seconds).
        valid: (N,) real-point mask (False rows are padding).
        pose0 / pose1: (4, 4) ego poses of this and the next frame.
        est_flow: (N, 3) estimated TOTAL flow (including ego motion), i.e. the
            ``data[res_name]`` field; pass the pose flow itself for the 'raw'
            baseline (zero motion flow).
        ground_mask: (N,) ground points (True = ground).
        flow_is_valid: (N,) optional GT-validity gate (Scania only).
        dataset: 'av2' or 'scania' — picks the ego-box and mask recipe.
        sensor_dt: sweep period, seconds.
    """
    xyz = pc0[:, :3]
    # Rigid ego-motion flow (eval.py:284-285) via the analytic SE(3) inverse.
    rot, t = relative_se3(pose0, pose1)
    rot = rot.astype(xyz.dtype)
    t = t.astype(xyz.dtype)
    pose_flow = (
        jnp.matmul(xyz, rot.T, precision=jax.lax.Precision.HIGHEST) + t - xyz
    )

    motion_flow = est_flow - pose_flow
    dt0 = dt0_from_lidar_dt(lidar_dt, valid)
    comp_dis = flow_to_comp_dis(motion_flow, dt0, sensor_dt)
    comp_dis = jnp.where(valid[:, None], comp_dis, 0.0)
    refined = xyz + comp_dis

    dis_mask = jnp.linalg.norm(xyz[:, :2], axis=-1) <= CLOSE_DISTANCE_THRESHOLD
    mask = dis_mask & (~ground_mask) & valid
    if dataset == "scania":
        mask &= ego_points_mask(xyz, *SCANIA_EGO_BOX)
        if flow_is_valid is not None:
            mask &= flow_is_valid
    else:
        mask &= ego_points_mask(xyz, *AV2_EGO_BOX)

    return DeskewResult(comp_dis, refined, motion_flow, mask, dt0)


# Batched over frames: every per-frame arg gains a leading batch dim.
deskew_batch = jax.jit(
    jax.vmap(
        lambda pc0, dt, valid, p0, p1, flow, gm: deskew_frame(
            pc0, dt, valid, p0, p1, flow, gm
        ),
    )
)
