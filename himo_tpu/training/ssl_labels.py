"""Self-supervised pseudo-labels: per-point dynamic masks + cluster ids.

Fills the role of the reference's ``+ssl_label=seflowpp_auto`` auxiliary
labels (assets/slurm/ssl-train-av2.sh:33; the SeFlow recipe uses DUFOMap
occupancy change + HDBSCAN in the absent submodule). TPU-era replacement:

- dynamic evidence — NN residual: after ego-compensation a static point
  finds a near neighbor in the next sweep; points whose NN distance exceeds
  ``dynamic_threshold`` are dynamic. (One-directional: occlusion in pc1 can
  yield false positives; a symmetric/backward check is future work.)
- clusters — DBSCAN over the dynamic points (sklearn on host; labels are
  data-prep artifacts, not in the jit path), ids compacted to
  ``1..num_clusters``, 0 = background.

Labels are written into the .h5 frame groups as ``ssl_dynamic`` (bool) and
``ssl_cluster`` (uint16) so training epochs stream them with the points.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from himo_tpu.core.transforms import rigid_flow  # numpy: host prep must not dispatch per-op to the device


def dynamic_mask_from_nn(
    pc0_comp: np.ndarray,
    pc1: np.ndarray,
    threshold: float = 0.18,
) -> np.ndarray:
    """Points of pc0_comp with no near neighbor in pc1 (host KD-tree;
    the native C++ tree when built, scipy otherwise)."""
    if len(pc1) == 0:
        return np.zeros(len(pc0_comp), dtype=bool)
    from himo_tpu import native

    if native.available():
        d, _ = native.KDTree(pc1[:, :3]).query(pc0_comp[:, :3])
    else:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(pc1[:, :3]).query(pc0_comp[:, :3], k=1)
    return d > threshold


def cluster_dynamic_points(
    points: np.ndarray,
    dynamic: np.ndarray,
    eps: float = 0.6,
    min_samples: int = 8,
    max_clusters: int = 63,
) -> np.ndarray:
    """DBSCAN cluster ids (1..max_clusters) for dynamic points, 0 elsewhere."""
    from sklearn.cluster import DBSCAN

    labels = np.zeros(len(points), dtype=np.uint16)
    idx = np.where(dynamic)[0]
    if len(idx) < min_samples:
        return labels
    raw = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points[idx, :3])
    # Compact to 1..max_clusters, largest clusters first.
    ids, counts = np.unique(raw[raw >= 0], return_counts=True)
    order = ids[np.argsort(-counts)][:max_clusters]
    remap = {int(cid): i + 1 for i, cid in enumerate(order)}
    labels[idx] = np.array([remap.get(int(c), 0) for c in raw], dtype=np.uint16)
    return labels


def label_frame(
    data: Dict[str, np.ndarray],
    threshold: float = 0.18,
    eps: float = 0.6,
    min_samples: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """(dynamic, cluster) labels for one frame-pair dict (needs pc1/gm1)."""
    xyz0 = data["pc0"][:, :3]
    xyz1 = data["pc1"][:, :3]
    pflow = rigid_flow(xyz0, data["pose0"], data["pose1"]).astype(np.float32)
    pc0_comp = xyz0 + pflow
    ng0 = ~np.asarray(data["gm0"], bool)
    ng1 = ~np.asarray(data["gm1"], bool)
    dynamic = np.zeros(len(xyz0), dtype=bool)
    dynamic[ng0] = dynamic_mask_from_nn(pc0_comp[ng0], xyz1[ng1], threshold)
    clusters = cluster_dynamic_points(pc0_comp, dynamic, eps, min_samples)
    return dynamic, clusters.astype(np.uint16)


def write_ssl_labels(data_dir, threshold: float = 0.18, verbose: bool = True) -> int:
    """Label every frame pair in a dataset; returns frames labeled."""
    import h5py
    from tqdm import tqdm

    from himo_tpu.data.dataset import SceneFlowDataset

    dataset = SceneFlowDataset(data_dir, with_pc1=True)
    it = range(len(dataset))
    if verbose:
        it = tqdm(it, ncols=100, desc=f"SSL labels for {data_dir}")
    n = 0
    for i in it:
        data = dataset[i]
        dynamic, clusters = label_frame(data, threshold=threshold)
        with h5py.File(dataset.directory / f"{data['scene_id']}.h5", "a") as f:
            g = f[str(data["timestamp"])]
            for key, arr in (("ssl_dynamic", dynamic), ("ssl_cluster", clusters)):
                if key in g:
                    del g[key]
                g.create_dataset(key, data=arr)
        n += 1
    return n
