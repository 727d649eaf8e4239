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
from himo_tpu.models.opt_loop import run_adam
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


@partial(jax.jit, static_argnames=("config",))
def fastnsf_flow(
    pc0: jax.Array,
    pc1: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    key: jax.Array,
    config: FastNSFConfig = FastNSFConfig(),
):
    """Optimize flow for one (ego-compensated) frame pair via DT lookups."""
    grid = distance_transform(pc1[:, :3], valid1, config.dt)
    params = init_mlp(key, hidden=config.hidden, layers=config.layers)
    cap = config.max_dist * config.max_dist
    denom = jnp.maximum(jnp.sum(valid0.astype(jnp.float32)), 1.0)

    def loss_fn(p):
        flow = apply_mlp(p, pc0[:, :3])
        d2 = sample_dt(grid, pc0[:, :3] + flow)
        d2 = jnp.minimum(d2, cap)
        return jnp.sum(jnp.where(valid0, d2, 0.0)) / denom

    params, best_loss, _ = run_adam(
        loss_fn,
        params,
        iterations=config.iterations,
        lr=config.lr,
        schedule=config.schedule,
        patience=config.patience,
        min_delta=config.min_delta,
    )
    flow = apply_mlp(params, pc0[:, :3])
    flow = jnp.where(valid0[:, None], flow, 0.0)
    return flow, best_loss


@register_estimator("fastnsf")
def make_fastnsf(**overrides):
    config = FastNSFConfig(**overrides)

    def estimate(pc0, pc1, valid0, valid1, key):
        return fastnsf_flow(pc0, pc1, valid0, valid1, key, config=config)

    return estimate


@register_estimator("fastnsf10")
def make_fastnsf10(**overrides):
    """The reference's stored variant key; a lighter iteration budget."""
    overrides.setdefault("iterations", 150)
    return make_fastnsf(**overrides)
