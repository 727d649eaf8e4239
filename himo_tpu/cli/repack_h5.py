"""Scene-file migration / repair tool.

Functional equivalent of the reference's ``tools/test/repack_h5_scania.py``
(:23-94): walk every scene, fix dtypes to the canonical schema (e.g. legacy
uint32 ids -> int64 for torch-compat consumers), rename legacy keys
(``SensorsCenter`` -> ``lidar_center`` with 4x4-ification), and drop keys on
request. Per-scene failures are reported and skipped (repack_h5_scania.py's
exception-swallowing behavior, SURVEY.md §5).

    python -m himo_tpu.cli.repack_h5 data_dir=... drop_keys='["old_key"]'
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np

from himo_tpu.utils.cli import run_cli

RENAMES: Dict[str, str] = {"SensorsCenter": "lidar_center"}
DTYPE_FIXES: Dict[str, str] = {"flow_instance_id": "int64"}


def _fix_center(value: np.ndarray) -> np.ndarray:
    """Legacy (L, 3) sensor centers -> (L, 4, 4) extrinsic matrices."""
    if value.ndim == 2 and value.shape[1] == 3:
        out = np.tile(np.eye(4, dtype=np.float32), (len(value), 1, 1))
        out[:, :3, 3] = value
        return out
    return value.astype(np.float32)


def repack_scene(path, drop_keys: Sequence[str] = ()) -> int:
    import h5py

    changed = 0
    with h5py.File(path, "a") as f:
        for group_key in list(f.keys()):
            g = f[group_key]
            for old, new in RENAMES.items():
                if old in g:
                    value = g[old][()]
                    if old == "SensorsCenter":
                        value = _fix_center(value)
                    if new in g:
                        del g[new]
                    g.create_dataset(new, data=value)
                    del g[old]
                    changed += 1
            for key, dtype in DTYPE_FIXES.items():
                if key in g and g[key].dtype != np.dtype(dtype):
                    value = g[key][()].astype(dtype)
                    del g[key]
                    g.create_dataset(key, data=value)
                    changed += 1
            for key in drop_keys:
                if key in g:
                    del g[key]
                    changed += 1
    return changed


def main(data_dir: str = "", drop_keys=()):
    if isinstance(drop_keys, str):
        drop_keys = [drop_keys]
    total = 0
    for path in sorted(Path(data_dir).glob("*.h5")):
        try:
            n = repack_scene(path, drop_keys)
            total += n
            print(f"{path.name}: {n} changes")
        except Exception as exc:  # keep going on per-scene corruption
            print(f"[ERROR] {path.name}: {exc}")
    print(f"Repacked {total} datasets total.")
    return total


if __name__ == "__main__":
    run_cli(main)
