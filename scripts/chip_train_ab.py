"""Round-5 chip A/B: full SSL train step at production shapes.

Measures the REAL train_step (seflowpp: instance head + gate + dyn-image
loss, sampled chamfer) so kernel-level wins (HIMO_NN_RT) and the instance
head's training cost are validated on the shipped graph, not a proxy:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_train_ab.py
    HIMO_NN_RT=4096 ... python scripts/chip_train_ab.py  # A/B the tile

Also reports the noprior (no instance head) step for the head's delta.
"""

from __future__ import annotations

import os
import time

import numpy as np

REPS = 5
CHAIN = 3
B, N, K = 8, 65536, 16384


def step_time(model_name: str) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.training.trainer import TrainConfig, make_train_step

    config = TrainConfig(
        model=model_name, batch_size=B, num_points=N, loss_points=K
    )
    model, _ = make_model(model_name)
    params = init_params(model, jax.random.PRNGKey(0), N)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, config, optimizer)

    rng = np.random.default_rng(0)
    import bench

    pc = lambda: jnp.asarray(bench.lidar_like_cloud(rng, B, N))  # noqa: E731
    batch = {
        "pc0": pc(), "pc1": pc(), "pc_hist": pc(),
        "valid0": jnp.ones((B, N), bool), "valid1": jnp.ones((B, N), bool),
        "valid_hist": jnp.ones((B, N), bool),
        "dynamic0": jnp.asarray(rng.random((B, N)) < 0.02),
        "dynamic1": jnp.asarray(rng.random((B, N)) < 0.02),
        "cluster0": jnp.asarray(
            rng.integers(0, 8, (B, N)), jnp.int32
        ),
        "prior0": jnp.asarray(
            rng.normal(0, 0.1, (B, N, 3)), jnp.float32
        ),
        "prior_valid0": jnp.asarray(rng.random((B, N)) < 0.02),
        "loss_idx0": jnp.asarray(
            rng.integers(0, N, (B, K)), jnp.int32
        ),
        "loss_idx1": jnp.asarray(
            rng.integers(0, N, (B, K)), jnp.int32
        ),
    }

    @jax.jit
    def tiny(x):
        return x + 1.0

    np.asarray(tiny(jnp.ones(())))
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(tiny(jnp.ones(())))
        ts.append(time.perf_counter() - t)
    rtt = float(np.median(ts))

    def run():
        nonlocal params, opt_state
        for _ in range(CHAIN):
            params, opt_state, metrics = train_step(params, opt_state, batch)
        # Force completion through the tunnel.
        np.asarray(metrics["total"])

    run()  # compile
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return (float(np.median(times)) - rtt) / CHAIN


def main() -> None:
    rt = os.environ.get("HIMO_NN_RT", "default")
    for name in ("seflowpp", "seflowpp_noprior"):
        t = step_time(name)
        print(
            f"[train_ab HIMO_NN_RT={rt} model={name}] "
            f"{1e3 * t:.0f} ms/step (B{B} N{N} K{K}, median of {REPS}x{CHAIN})"
        )


if __name__ == "__main__":
    main()
