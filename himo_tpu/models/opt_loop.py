"""Shared on-device Adam loop for the runtime-optimization estimators
(NSFP / FastNSF — the ``model=nsfp`` / ``model=fastnsf`` surfaces of
/root/reference/README.md:52, whose per-frame optimizers live in the absent
OpenSceneFlow submodule; early stopping is the original NSFP recipe).

Two modes:
- fixed-length ``lax.scan`` (deterministic step count);
- early stopping via ``lax.while_loop`` with best-parameter tracking:
  stop once the loss hasn't improved by ``min_delta`` (relative) for
  ``patience`` steps — the classic NSFP recipe, and a real wall-clock win
  on easy frames since the loop is dynamic under jit.

An optional cosine learning-rate decay replaces the constant Adam lr.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def run_adam(
    loss_fn,
    params,
    *,
    iterations: int,
    lr: float,
    schedule: str = "constant",
    patience: int = 0,
    min_delta: float = 1e-4,
):
    """Minimize ``loss_fn`` over ``params``; returns (params, loss, steps).

    ``patience=0`` -> fixed-length scan. Otherwise early-stops and returns
    the BEST parameters seen, not the last ones.
    """
    if schedule == "cosine":
        opt = optax.adam(optax.cosine_decay_schedule(lr, iterations))
    else:
        opt = optax.adam(lr)
    opt_state = opt.init(params)

    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    if not patience:

        def scan_step(carry, _):
            p, s = carry
            p, s, loss = step(p, s)
            return (p, s), loss

        (p, _), losses = jax.lax.scan(
            scan_step, (params, opt_state), None, length=iterations
        )
        return p, losses[-1], jnp.asarray(iterations, jnp.int32)

    def cond(state):
        _, _, _, _, since, it = state
        return (it < iterations) & (since < patience)

    def body(state):
        p, s, best_p, best_l, since, it = state
        # ``loss`` is evaluated at the PRE-update params p — that is the
        # candidate for "best", not the post-update p_new (whose loss is
        # unknown until the next iteration).
        p_new, s, loss = step(p, s)
        improved = loss < best_l * (1.0 - min_delta)
        best_p = jax.tree.map(
            lambda cand, old: jnp.where(improved, cand, old), p, best_p
        )
        best_l = jnp.where(improved, loss, best_l)
        since = jnp.where(improved, 0, since + 1)
        return (p_new, s, best_p, best_l, since, it + 1)

    init = (
        params,
        opt_state,
        params,
        jnp.asarray(jnp.inf, jnp.float32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    _, _, best_p, best_l, _, it = jax.lax.while_loop(cond, body, init)
    return best_p, best_l, it
