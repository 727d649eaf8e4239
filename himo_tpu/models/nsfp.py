"""Neural Scene Flow Prior — per-frame runtime optimization, fully jitted.

Capability parity with the reference's ``model=nsfp`` surface (README.md:52,
h5 key ``nsfp`` at tools/view_instance.py:155): a coordinate MLP is optimized
per frame pair against a bidirectional truncated Chamfer between the warped
ego-compensated pc0 and pc1. The whole Adam loop is one ``lax.scan`` on
device; NN distances come from the streaming Pallas kernel
(:mod:`himo_tpu.ops.nn`), so no KD-trees and no host round-trips.

Inputs are fixed-size padded clouds with validity masks (XLA static shapes);
invalid points neither contribute loss nor receive flow.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from himo_tpu.models.coordinate_mlp import apply_mlp, init_mlp
from himo_tpu.models.opt_loop import run_adam
from himo_tpu.models.registry import register_estimator
from himo_tpu.ops.nn import truncated_chamfer


@dataclasses.dataclass(frozen=True)
class NSFPConfig:
    hidden: int = 128
    layers: int = 8
    iterations: int = 500
    lr: float = 8e-3
    max_dist: float = 2.0  # Chamfer truncation radius (m)
    patience: int = 0  # >0: early-stop after this many non-improving steps
    min_delta: float = 1e-4  # relative improvement that resets patience
    schedule: str = "constant"  # or 'cosine'


@partial(jax.jit, static_argnames=("config",))
def nsfp_flow(
    pc0: jax.Array,
    pc1: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    key: jax.Array,
    config: NSFPConfig = NSFPConfig(),
):
    """Optimize flow for one (ego-compensated) frame pair.

    Returns (flow (N0, 3), best_loss). Early stopping (``patience``) runs
    the Adam loop as a dynamic ``lax.while_loop`` and keeps the best
    parameters — the classic NSFP recipe (models/opt_loop.py).
    """
    params = init_mlp(key, hidden=config.hidden, layers=config.layers)

    def loss_fn(p):
        flow = apply_mlp(p, pc0[:, :3])
        return truncated_chamfer(
            pc0[:, :3] + flow,
            pc1[:, :3],
            valid1=valid0,
            valid2=valid1,
            max_dist=config.max_dist,
        )

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


@register_estimator("nsfp")
def make_nsfp(**overrides):
    config = NSFPConfig(**overrides)

    def estimate(pc0, pc1, valid0, valid1, key):
        return nsfp_flow(pc0, pc1, valid0, valid1, key, config=config)

    return estimate
