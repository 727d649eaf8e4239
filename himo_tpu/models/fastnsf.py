"""Fast Neural Scene Flow — NSFP with a distance-transform loss.

Capability parity with the reference's ``model=fastnsf`` surface (README.md:52,
h5 key ``fastnsf10``): the per-iteration NN query is replaced by ONE
precomputed squared-distance field of pc1 (:mod:`himo_tpu.ops.dt`), sampled
trilinearly at the warped points (Fast Neural Scene Flow, arXiv 2304.09121).
Each optimizer step is then a pure gather + MLP — an order of magnitude
cheaper than Chamfer per step, and the whole loop is one jitted
``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from himo_tpu.models.coordinate_mlp import apply_mlp, init_mlp
from himo_tpu.models.opt_loop import anneal_caps, run_adam
from himo_tpu.models.registry import register_estimator
from himo_tpu.ops.dt import DTConfig, distance_transform, sample_dt


@dataclasses.dataclass(frozen=True)
class FastNSFConfig:
    hidden: int = 128
    layers: int = 8
    iterations: int = 500
    lr: float = 8e-3
    max_dist: float = 2.0  # truncation radius (m)
    dt: DTConfig = DTConfig()
    patience: int = 0  # >0: early-stop window (fixed-length loop otherwise)
    min_delta: float = 1e-4
    schedule: str = "constant"  # or 'cosine'
    # Coarse-to-fine truncation annealing (see NSFPConfig). Default OFF:
    # measured HARMFUL for the DT loss (runner A/B on synthetic scenes: MPE
    # 0.82 plain -> 2.11 annealed) — during the coarse phase, border-clamped
    # DT reads and sparse-region distances feed large outlier gradients that
    # the fine phase cannot unlearn. The cluster prior is the fast-object
    # mechanism instead.
    coarse_init: float = 0.0
    anneal_frac: float = 0.5
    # Cluster translation prior seeding (see NSFPConfig.cluster_prior).
    cluster_prior: bool = True
    prior_threshold: float = 0.18
    prior_eps: float = 1.0
    prior_min_samples: int = 5
    prior_match_gate: float = 6.0
    prior_min_norm: float = 1.0


@partial(jax.jit, static_argnames=("config",))
def fastnsf_flow(
    pc0: jax.Array,
    pc1: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    key: jax.Array,
    config: FastNSFConfig = FastNSFConfig(),
    prior_flow: jax.Array | None = None,
):
    """Optimize flow for one (ego-compensated) frame pair via DT lookups."""
    grid = distance_transform(pc1[:, :3], valid1, config.dt)
    params = init_mlp(key, hidden=config.hidden, layers=config.layers)
    denom = jnp.maximum(jnp.sum(valid0.astype(jnp.float32)), 1.0)
    coarse = config.coarse_init > config.max_dist
    base = jnp.zeros_like(pc0[:, :3]) if prior_flow is None else prior_flow

    def loss_fn(p, cap_dist=config.max_dist):
        flow = base + apply_mlp(p, pc0[:, :3])
        d2 = sample_dt(grid, pc0[:, :3] + flow)
        d2 = jnp.minimum(d2, cap_dist * cap_dist)
        return jnp.sum(jnp.where(valid0, d2, 0.0)) / denom

    params, best_loss, _ = run_adam(
        loss_fn,
        params,
        iterations=config.iterations,
        lr=config.lr,
        schedule=config.schedule,
        patience=config.patience,
        min_delta=config.min_delta,
        step_caps=anneal_caps(
            config.iterations, config.max_dist, config.coarse_init,
            config.anneal_frac,
        )
        if coarse
        else None,
        track_from=int(config.anneal_frac * config.iterations) if coarse else 0,
    )
    flow = base + apply_mlp(params, pc0[:, :3])
    flow = jnp.where(valid0[:, None], flow, 0.0)
    return flow, best_loss


@register_estimator("fastnsf")
def make_fastnsf(**overrides):
    from himo_tpu.models.icp_flow import ClusterTracker

    config = FastNSFConfig(**overrides)
    trackers = {}  # per-scene velocity continuity (runner feeds frames in order)

    def estimate(pc0, pc1, valid0, valid1, key, dt0=None, dt1=None,
                 scene_id=None, pose1=None):
        from himo_tpu.models.nsfp import cluster_prior_flow

        tracker = None
        if scene_id is not None and pose1 is not None:
            tracker = trackers.setdefault(scene_id, ClusterTracker())
        prior = (
            cluster_prior_flow(
                pc0, pc1, valid0, valid1, config,
                dt0=dt0, dt1=dt1, tracker=tracker, pose1=pose1,
            )
            if config.cluster_prior
            else None
        )
        return fastnsf_flow(
            pc0, pc1, valid0, valid1, key, config=config, prior_flow=prior
        )

    estimate.trackers = trackers  # models/runner.py's scene-start repair
    return estimate


@register_estimator("fastnsf10")
def make_fastnsf10(**overrides):
    """The reference's stored variant key; a lighter iteration budget."""
    overrides.setdefault("iterations", 150)
    return make_fastnsf(**overrides)
