"""Argoverse 2 sensor-dataset ingestion: raw logs -> .h5 scenes (layer L0).

The reference gets its AV2 .h5 scenes from the absent OpenSceneFlow
preprocessing (SURVEY.md §2.5 notes ground_mask "written by OpenSceneFlow
preprocessing, not local code"); this module provides the equivalent
converter over the standard AV2 sensor layout:

    {log_id}/
      city_SE3_egovehicle.feather      # timestamp_ns, qw..qz, tx_m..tz_m
      annotations.feather              # cuboids per sweep, ego frame
      sensors/lidar/{timestamp_ns}.feather  # x y z intensity laser_number offset_ns

GT flow follows the track-transform identity: a point p (ego0) on track T
moves to ``inv(pose1) @ city_T1 @ inv(city_T0) @ pose0 @ p`` at t1; static
points reduce to the pure ego-motion flow, so the stored ``flow`` is exactly
what eval.py's ``flow - pose_flow`` decomposition expects. Point-in-box
assignment uses :func:`himo_tpu.ops.points_in_boxes`; ground comes from
:func:`himo_tpu.ops.ground.ground_mask`.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from himo_tpu.core.categories import CATEGORY_TO_INDEX, NAME_MAPPING


def quat_to_rotation(qw, qx, qy, qz) -> np.ndarray:
    """(…,) quaternion components -> (…, 3, 3) rotation matrices."""
    qw, qx, qy, qz = (np.asarray(v, np.float64) for v in (qw, qx, qy, qz))
    r = np.empty(qw.shape + (3, 3))
    r[..., 0, 0] = 1 - 2 * (qy**2 + qz**2)
    r[..., 0, 1] = 2 * (qx * qy - qw * qz)
    r[..., 0, 2] = 2 * (qx * qz + qw * qy)
    r[..., 1, 0] = 2 * (qx * qy + qw * qz)
    r[..., 1, 1] = 1 - 2 * (qx**2 + qz**2)
    r[..., 1, 2] = 2 * (qy * qz - qw * qx)
    r[..., 2, 0] = 2 * (qx * qz - qw * qy)
    r[..., 2, 1] = 2 * (qy * qz + qw * qx)
    r[..., 2, 2] = 1 - 2 * (qx**2 + qy**2)
    return r


def _se3(qw, qx, qy, qz, tx, ty, tz) -> np.ndarray:
    pose = np.eye(4)
    pose[:3, :3] = quat_to_rotation(qw, qx, qy, qz)
    pose[:3, 3] = [tx, ty, tz]
    return pose


def load_poses(log_dir) -> Dict[int, np.ndarray]:
    """timestamp_ns -> city_SE3_egovehicle 4x4."""
    import pandas as pd

    df = pd.read_feather(Path(log_dir) / "city_SE3_egovehicle.feather")
    return {
        int(row.timestamp_ns): _se3(
            row.qw, row.qx, row.qy, row.qz, row.tx_m, row.ty_m, row.tz_m
        )
        for row in df.itertuples()
    }


def load_annotations(log_dir) -> Dict[int, Dict[str, dict]]:
    """timestamp_ns -> {track_uuid: cuboid dict (ego frame)}."""
    import pandas as pd

    path = Path(log_dir) / "annotations.feather"
    if not path.exists():
        return {}
    df = pd.read_feather(path)
    out: Dict[int, Dict[str, dict]] = {}
    for row in df.itertuples():
        out.setdefault(int(row.timestamp_ns), {})[str(row.track_uuid)] = {
            "pose": _se3(row.qw, row.qx, row.qy, row.qz, row.tx_m, row.ty_m, row.tz_m),
            "dims": np.array([row.length_m, row.width_m, row.height_m]),
            "category": str(row.category),
            "yaw": float(
                np.arctan2(
                    2 * (row.qw * row.qz + row.qx * row.qy),
                    1 - 2 * (row.qy**2 + row.qz**2),
                )
            ),
        }
    return out


def read_sweep(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """lidar feather -> ((N,4) xyzi, (N,) laser id, (N,) intra-sweep seconds)."""
    import pandas as pd

    df = pd.read_feather(path)

    def col(name, dtype):
        if name in df.columns:
            return np.asarray(df[name], dtype=dtype)
        return np.zeros(len(df), dtype=dtype)

    pc = np.stack(
        [col("x", np.float32), col("y", np.float32), col("z", np.float32),
         col("intensity", np.float32)],
        axis=1,
    )
    laser = col("laser_number", np.uint8)
    offset = col("offset_ns", np.float64) * 1e-9
    return pc, laser, offset.astype(np.float32)


def compute_av2_flow(
    pc0: np.ndarray,
    pose0: np.ndarray,
    pose1: np.ndarray,
    annos0: Dict[str, dict],
    annos1: Dict[str, dict],
    track_index: Dict[str, int],
    expansion: float = 0.2,
) -> Dict[str, np.ndarray]:
    """GT flow for one frame pair via per-track rigid transforms."""
    from himo_tpu.core.transforms import relative_pose, transform_points
    from himo_tpu.ops.points_in_boxes import points_in_boxes

    n = len(pc0)
    ego1_T_ego0 = relative_pose(pose0, pose1)
    flow = (transform_points(pc0[:, :3], ego1_T_ego0) - pc0[:, :3]).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    classes = np.zeros(n, dtype=np.uint8)
    instance = np.zeros(n, dtype=np.uint32)

    tracks = list(annos0)
    if tracks:
        boxes = np.zeros((len(tracks), 7), np.float32)
        for k, uuid in enumerate(tracks):
            a = annos0[uuid]
            center = a["pose"][:3, 3]
            boxes[k] = [
                center[0],
                center[1],
                center[2] - a["dims"][2] / 2,
                a["dims"][0] + expansion,
                a["dims"][1] + expansion,
                a["dims"][2] + expansion,
                a["yaw"],
            ]
        box_idx = np.asarray(points_in_boxes(pc0[:, :3].astype(np.float32), boxes))
        hit = box_idx >= 0
        for k, uuid in enumerate(tracks):
            mask = hit & (box_idx == k)
            if not mask.any():
                continue
            a0 = annos0[uuid]
            classes[mask] = CATEGORY_TO_INDEX.get(
                NAME_MAPPING.get(a0["category"], "NONE"), 0
            )
            instance[mask] = track_index[uuid]
            if uuid in annos1:
                # city_T = city_SE3_ego @ ego_SE3_box; point moves with the box.
                city_t0 = pose0 @ a0["pose"]
                city_t1 = pose1 @ annos1[uuid]["pose"]
                move = (
                    np.linalg.inv(pose1) @ city_t1 @ np.linalg.inv(city_t0) @ pose0
                )
                flow[mask] = (
                    transform_points(pc0[mask][:, :3], move) - pc0[mask][:, :3]
                ).astype(np.float32)
            else:
                valid[mask] = False  # track vanished: flow unknowable

    return {
        "flow": flow,
        "valid": valid,
        "classes": classes,
        "instance": instance,
        "ego_motion": ego1_T_ego0.astype(np.float32),
    }


def process_log(
    log_dir,
    output_dir,
    scene_id: Optional[str] = None,
    with_ground: bool = True,
) -> Optional[str]:
    """Convert one AV2 log into ``{output_dir}/{scene_id}.h5``."""
    import h5py

    from himo_tpu.data.schema import FrameData, write_frame
    from himo_tpu.ops.ground import ground_mask as compute_ground

    log_dir = Path(log_dir)
    scene_id = scene_id or log_dir.name
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    sweep_paths = sorted(
        (log_dir / "sensors" / "lidar").glob("*.feather"),
        key=lambda p: int(p.stem),
    )
    if not sweep_paths:
        print(f"{scene_id}: no lidar sweeps, skip.")
        return None
    poses = load_poses(log_dir)
    annotations = load_annotations(log_dir)
    track_index: Dict[str, int] = {}
    for annos in annotations.values():
        for uuid in annos:
            track_index.setdefault(uuid, len(track_index) + 1)

    h5_path = output_dir / f"{scene_id}.h5"
    with h5py.File(h5_path, "a") as f:
        if len(f.keys()) == len(sweep_paths):
            print(f"{scene_id} already exists with all frames, skip.")
            return None
        for i, sweep in enumerate(sweep_paths):
            ts = int(sweep.stem)
            if str(ts) in f:
                continue
            pc, laser, dt = read_sweep(sweep)
            pose0 = poses[ts]
            gm = (
                np.asarray(compute_ground(pc[:, :3]))
                if with_ground
                else np.zeros(len(pc), bool)
            )
            flow_fields = {}
            if i + 1 < len(sweep_paths):
                ts1 = int(sweep_paths[i + 1].stem)
                gt = compute_av2_flow(
                    pc,
                    pose0,
                    poses[ts1],
                    annotations.get(ts, {}),
                    annotations.get(ts1, {}),
                    track_index,
                )
                flow_fields = dict(
                    flow=gt["flow"],
                    flow_is_valid=gt["valid"],
                    flow_category_indices=gt["classes"],
                    flow_instance_id=gt["instance"],
                    ego_motion=gt["ego_motion"],
                )
            write_frame(
                f,
                FrameData(
                    lidar=pc,
                    lidar_id=laser,
                    lidar_dt=dt,
                    pose=pose0,
                    timestamp=ts,
                    ground_mask=gm,
                    **flow_fields,
                ),
            )
    return str(h5_path)
