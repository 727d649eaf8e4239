"""Headline benchmark: compensated points/sec through the full TPU pipeline.

Runs the flagship path on synthetic multi-LiDAR sweeps on whatever device is
default (the driver runs it on one real TPU chip): SeFlow++-class pillar-UNet
flow inference + fused per-point de-skew, batched frames, everything jitted.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpts/s", "vs_baseline": N}

``vs_baseline`` compares against the north-star target of 20 M points/sec on
a v5e-8 (BASELINE.json) prorated to one chip: 2.5 M points/sec/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

PER_CHIP_TARGET = 20e6 / 8  # north-star prorated to a single chip


def main() -> dict:
    import jax
    import jax.numpy as jnp

    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.ops.voxelize import PillarConfig

    batch = 8
    num_points = 65536
    pillar = PillarConfig(voxel_size=(0.4, 0.4))  # 256x256 pseudo-image
    model, config = make_model("seflowpp", pillar=pillar, dtype="bfloat16")
    params = init_params(model, jax.random.PRNGKey(0), num_points=num_points)

    def frame(params, pc0, pc1, pc_hist, valid, dt0):
        flow = model.apply(params, (pc0, pc1, pc_hist), (valid, valid, valid))
        comp_dis = flow * (dt0 / 0.1)[:, None]
        return pc0 + comp_dis

    CHAIN = 10  # frames chained per dispatch to amortize host<->TPU latency

    @jax.jit
    def step_chain(params, pc0, pc1, pc_hist, valid, dt0):
        # Each iteration's output feeds the next input: a real data
        # dependency, so nothing can be elided or overlapped away.
        def body(carry, _):
            refined = jax.vmap(frame, in_axes=(None, 0, 0, 0, 0, 0))(
                params, carry, pc1, pc_hist, valid, dt0
            )
            return refined, None

        out, _ = jax.lax.scan(body, pc0, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])  # scalar readback forces completion

    rng = np.random.default_rng(0)
    cloud = lambda: jnp.asarray(  # noqa: E731
        rng.uniform(-50, 50, size=(batch, num_points, 3)), jnp.float32
    )
    pc0, pc1, pc_hist = cloud(), cloud(), cloud()
    valid = jnp.ones((batch, num_points), bool)
    dt0 = jnp.asarray(rng.uniform(0, 0.1, size=(batch, num_points)), jnp.float32)

    # Warmup / compile (np.asarray forces real completion through tunnels
    # whose block_until_ready acks early).
    np.asarray(step_chain(params, pc0, pc1, pc_hist, valid, dt0))

    # Estimate dispatch round-trip to subtract it.
    @jax.jit
    def tiny(x):
        return x + 1.0

    np.asarray(tiny(jnp.ones(())))
    rtts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(tiny(jnp.ones(())))
        rtts.append(time.perf_counter() - t)
    rtt = float(np.median(rtts))

    times = []
    for _ in range(5):
        start = time.perf_counter()
        np.asarray(step_chain(params, pc0, pc1, pc_hist, valid, dt0))
        times.append(time.perf_counter() - start)
    elapsed = max(float(np.median(times)) - rtt, 1e-9) / CHAIN

    pts_per_sec = batch * num_points / elapsed
    result = {
        "metric": "seflowpp_inference_deskew_points_per_sec_per_chip",
        "value": round(pts_per_sec / 1e6, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(pts_per_sec / PER_CHIP_TARGET, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
