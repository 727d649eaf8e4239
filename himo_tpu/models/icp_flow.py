"""ICP-Flow — cluster-and-register scene flow (h5 key ``icpflow``).

Capability parity with the reference's ``icpflow`` baseline (method list at
tools/view_instance.py:155-157): dynamic points are clustered, and each
cluster is rigidly registered against the next sweep with ICP; its rigid
transform becomes the flow of its points (static points keep zero residual).

TPU-first split:
- clustering stays on host (DBSCAN, a data-prep-scale cost);
- ALL cluster ICPs run as one jitted, vmapped program: every iteration does
  a batched correspondence search via the streaming NN-argmin kernel and a
  weighted Kabsch (3x3 SVD) per cluster — ``lax.scan`` over iterations,
  static cluster count/capacity.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from himo_tpu.models.registry import register_estimator
from himo_tpu.ops.nn import nn_argmin


@dataclasses.dataclass(frozen=True)
class ICPFlowConfig:
    max_clusters: int = 32
    cluster_capacity: int = 1024
    icp_iters: int = 12
    max_corr_dist: float = 2.0
    # Looser DBSCAN than round 2 (0.8/10): sparse objects at range fragment
    # under tight eps, and fragments mismatch across sweeps. Measured on the
    # bucket-complete suite: eps 1.0 / min_samples 5 took per-point dynamic
    # EPE 1.16 -> 0.65, capacity 1024 -> 0.61 (big TRUCK clusters truncated
    # at 512 lost half their points).
    dbscan_eps: float = 1.0
    dbscan_min_samples: int = 5
    dynamic_threshold: float = 0.18
    # Fast-object handling (HiMo's target regime): clusters moving 2.5-3.4 m
    # between sweeps find no correspondences inside the 2 m ICP gate, so (a)
    # pc1's dynamic points are clustered too and each pc0 cluster's
    # translation is INITIALIZED from its matched pc1 centroid (greedy 1-1,
    # gated at ``match_gate`` meters = ~45 m/s at 10 Hz), and (b) the
    # correspondence gate anneals from ``coarse_corr_dist`` down to
    # ``max_corr_dist`` over the ICP iterations.
    match_gate: float = 6.0
    coarse_corr_dist: float = 4.0


def weighted_kabsch(src: jax.Array, dst: jax.Array, w: jax.Array):
    """Weighted rigid alignment src -> dst. Returns (R, t).

    Falls back to identity when fewer than 3 effective correspondences."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    wn = (w / wsum)[:, None]
    cs = jnp.sum(src * wn, axis=0)
    cd = jnp.sum(dst * wn, axis=0)
    a = (src - cs) * wn
    b = dst - cd
    h = a.T @ b  # (3, 3)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    d = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    rot = vt.T @ d @ u.T
    t = cd - rot @ cs
    ok = jnp.sum(w) >= 3.0
    rot = jnp.where(ok, rot, jnp.eye(3))
    t = jnp.where(ok, t, jnp.zeros(3))
    return rot, t


@partial(jax.jit, static_argnames=("config",))
def icp_register_clusters(
    clusters: jax.Array,  # (C, K, 3)
    cluster_valid: jax.Array,  # (C, K)
    pc1: jax.Array,  # (M, 3)
    valid1: jax.Array,  # (M,)
    config: ICPFlowConfig = ICPFlowConfig(),
    init_t: jax.Array | None = None,  # (C, 3) translation seeds
):
    """Per-cluster rigid registration; returns per-cluster-point flow (C, K, 3).

    ``init_t`` seeds each cluster's translation (from centroid matching of
    dynamic clusters across the sweeps) so fast clusters start inside the
    correspondence gate; the gate itself anneals ``coarse_corr_dist`` ->
    ``max_corr_dist`` geometrically over the iterations."""
    if init_t is None:
        init_t = jnp.zeros((clusters.shape[0], 3), jnp.float32)
    fine = config.max_corr_dist
    coarse = max(config.coarse_corr_dist, fine)
    it = jnp.arange(config.icp_iters, dtype=jnp.float32)
    frac = it / jnp.maximum(config.icp_iters - 1.0, 1.0)
    caps2 = (coarse * (fine / coarse) ** frac) ** 2  # (icp_iters,)

    def one(pts, mask, t0):
        def body(carry, cap2):
            rot, t = carry
            moved = pts @ rot.T + t
            d2, idx = nn_argmin(moved, pc1, mask, valid1)
            corr = pc1[idx]
            w = (mask & (d2 < cap2)).astype(jnp.float32)
            rot2, t2 = weighted_kabsch(pts, corr, w)
            return (rot2, t2), d2

        (rot, t), _ = jax.lax.scan(body, (jnp.eye(3), t0), caps2)
        flow = pts @ rot.T + t - pts
        return jnp.where(mask[:, None], flow, 0.0)

    return jax.vmap(one)(clusters, cluster_valid, init_t)


def _refine_translation(
    pts0: np.ndarray,
    pts1: np.ndarray,
    delta: np.ndarray,
    iters: int = 3,
    trim_pct: float = 75.0,
) -> np.ndarray:
    """Trimmed translation-only ICP refinement of a cluster-pair delta.

    Each round queries NNs of the shifted pts0 in pts1, keeps the closest
    ``trim_pct`` percent of pairs (coverage mismatch between the frames'
    clusters otherwise biases the step), and moves by their mean residual
    vector."""
    from himo_tpu import native

    if native.available():
        tree = native.KDTree(pts1[:, :3])
        query = tree.query
    else:
        from scipy.spatial import cKDTree

        tree = cKDTree(pts1[:, :3])
        query = lambda q: tree.query(q, k=1)  # noqa: E731
    delta = np.asarray(delta, np.float32).copy()
    for _ in range(iters):
        shifted = pts0[:, :3] + delta
        dist, idx = query(shifted)
        keep = dist <= np.percentile(dist, trim_pct)
        if not keep.any():
            break
        delta = delta + (pts1[idx[keep], :3] - shifted[keep]).mean(0)
    return delta.astype(np.float32)


def match_cluster_translations(
    pc0: np.ndarray,
    labels0: np.ndarray,
    pc1: np.ndarray,
    labels1: np.ndarray,
    max_clusters: int,
    match_gate: float,
    verify_tol: float = 0.45,
    spacing_factor: float = 1.75,
):
    """Translation seeds from VERIFIED 1-1 cluster matching.

    For every (pc0 cluster, pc1 cluster) pair whose centroids lie within
    ``match_gate`` meters, the candidate delta (centroid difference, refined
    by trimmed translation-ICP) is verified by aligning the clusters and
    scoring the TWO-SIDED mean NN residual — the max of (shifted pc0 -> pc1)
    and (pc1 -> shifted pc0) mean distances. One-sided medians cannot tell
    two same-model vehicles apart (measured on the benchmark: a wrong car-to-
    car match scored median 0.30 while its two-sided mean was 1.25 vs ~0.25
    for every true pair — full-coverage residuals expose the differing
    rolling-shutter smears). The acceptance tolerance is DENSITY-AWARE:
    ``max(verify_tol, spacing_factor * median intra-cluster NN spacing)`` —
    a correct alignment can never score below the cluster's own sampling
    granularity, so sparse clusters at range keep their (true) matches while
    dense wrong-object pairs stay rejected. Pairs are accepted greedily by
    ascending error, each side used once. This is the fast-object
    initialization role of ICP-Flow's histogram translation search — objects
    moving beyond the ICP correspondence gate start inside it.

    Returns ((max_clusters, 3) float32 seeds, (max_clusters,) bool matched).
    """
    from himo_tpu.training.ssl_labels import nn_residual_distances

    init_t = np.zeros((max_clusters, 3), np.float32)
    matched = np.zeros(max_clusters, bool)
    n0, n1 = int(labels0.max()), int(labels1.max())
    if n0 == 0 or n1 == 0:
        return init_t, matched
    pts0 = [pc0[labels0 == c] for c in range(1, n0 + 1)]
    pts1 = [pc1[labels1 == c] for c in range(1, n1 + 1)]
    cents0 = np.stack([p.mean(0) for p in pts0])
    cents1 = np.stack([p.mean(0) for p in pts1])
    d = np.linalg.norm(cents0[:, None] - cents1[None, :], axis=-1)  # (n0, n1)

    def self_spacing(pts):
        # Odd/even split (scan order is spatially sequential, so the halves
        # interleave) — the median cross distance estimates point spacing.
        if len(pts) < 4:
            return np.inf
        return float(np.median(nn_residual_distances(pts[0::2], pts[1::2])))

    spacing1 = [self_spacing(p) for p in pts1]

    candidates = []  # (alignment_error, i, j, delta)
    for i in range(n0):
        for j in range(n1):
            if d[i, j] > match_gate:
                continue
            # Raw centroid deltas are biased by ~1 m when the two frames'
            # clusters cover different subsets of the object (partial
            # clustering of rolling-shutter smears — measured on the 25 m/s
            # benchmark bucket); trimmed translation-only ICP removes it.
            delta = _refine_translation(
                pts0[i], pts1[j], cents1[j] - cents0[i]
            )
            shifted = pts0[i] + delta
            fwd = nn_residual_distances(shifted, pts1[j])
            bwd = nn_residual_distances(pts1[j], shifted)
            err = float(max(fwd.mean(), bwd.mean()))
            tol = max(verify_tol, spacing_factor * spacing1[j])
            if err <= tol:
                candidates.append((err, i, j, delta))
    candidates.sort(key=lambda c: c[0])
    used0, used1 = set(), set()
    for err, i, j, delta in candidates:
        if i in used0 or j in used1:
            continue
        used0.add(i)
        used1.add(j)
        if i < max_clusters:
            init_t[i] = delta
            matched[i] = True
    return init_t, matched


def icpflow_estimate(
    pc0: np.ndarray,
    pc1: np.ndarray,
    valid0: np.ndarray,
    valid1: np.ndarray,
    config: ICPFlowConfig = ICPFlowConfig(),
):
    """Full ICP-Flow: host clustering + device batched registration.

    pc0 must already be ego-compensated into the pc1 frame; the returned
    residual flow is zero on static/unclustered points.
    """
    from himo_tpu.training.ssl_labels import cluster_dynamic_points, dynamic_mask_from_nn

    pc0 = np.asarray(pc0[:, :3], np.float32)
    pc1 = np.asarray(pc1[:, :3], np.float32)
    valid0 = np.asarray(valid0, bool)
    valid1 = np.asarray(valid1, bool)

    dynamic = np.zeros(len(pc0), bool)
    dynamic[valid0] = dynamic_mask_from_nn(
        pc0[valid0], pc1[valid1], config.dynamic_threshold
    )
    labels = cluster_dynamic_points(
        pc0,
        dynamic,
        eps=config.dbscan_eps,
        min_samples=config.dbscan_min_samples,
        max_clusters=config.max_clusters,
    )

    flow = np.zeros_like(pc0)
    n_clusters = int(labels.max())
    if n_clusters == 0:
        return flow, 0.0

    # pc1's dynamic clusters give the translation seeds (fast-object init).
    dynamic1 = np.zeros(len(pc1), bool)
    dynamic1[valid1] = dynamic_mask_from_nn(
        pc1[valid1], pc0[valid0], config.dynamic_threshold
    )
    labels1 = cluster_dynamic_points(
        pc1,
        dynamic1,
        eps=config.dbscan_eps,
        min_samples=config.dbscan_min_samples,
        max_clusters=config.max_clusters,
    )
    init_t, _ = match_cluster_translations(
        pc0, labels, pc1, labels1, config.max_clusters, config.match_gate
    )

    c, k = config.max_clusters, config.cluster_capacity
    clusters = np.zeros((c, k, 3), np.float32)
    cluster_valid = np.zeros((c, k), bool)
    point_slots = {}
    for cid in range(1, n_clusters + 1):
        idx = np.where(labels == cid)[0][:k]
        clusters[cid - 1, : len(idx)] = pc0[idx]
        cluster_valid[cid - 1, : len(idx)] = True
        point_slots[cid] = idx

    cluster_flow = np.asarray(
        icp_register_clusters(
            clusters, cluster_valid, pc1, valid1, config, jnp.asarray(init_t)
        )
    )
    for cid, idx in point_slots.items():
        flow[idx] = cluster_flow[cid - 1, : len(idx)]
    return flow, 0.0


@register_estimator("icpflow")
def make_icpflow(**overrides):
    config = ICPFlowConfig(**overrides)

    def estimate(pc0, pc1, valid0, valid1, key=None):
        return icpflow_estimate(pc0, pc1, valid0, valid1, config)

    return estimate
