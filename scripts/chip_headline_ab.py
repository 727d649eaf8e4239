"""Attribute the round-5 headline drop (5.061 -> 1.545 Mpts/s at 512^2)
across the three new flagship components: BEV correlation volume, instance
head (CC + pooling), and the ICP refinement head.

Same protocol as bench.measure (chained scan, RTT-subtracted, median of 5),
one config per row so each compile is independent:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_headline_ab.py \
        [rows...]   # default: all

Rows:
    gate        gate head only (round-4 noprior equivalent)
    corr        + correlation volume           (isolates corr)
    instance    + instance head, refine off    (isolates CC+pooling)
    full        + refine head                  (the shipped seflowpp)
    refine5     full with a 5-pass tau schedule (cost/quality knob probe)
    refine_q2k  full with num_query 2048 / num_ref 4096 (subset knob probe)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import BATCH, NUM_POINTS, VALID_FRACTION, lidar_like_cloud  # noqa: E402


def measure(name: str, overrides: dict, refine_arg, rtt: float) -> float:
    import jax
    import jax.numpy as jnp

    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.ops.voxelize import PillarConfig

    overrides = dict(overrides)
    label = overrides.pop("_label", name)
    pillar = PillarConfig(voxel_size=(0.2, 0.2))
    model, _ = make_model(name, pillar=pillar, dtype="bfloat16", **overrides)
    params = init_params(model, jax.random.PRNGKey(0), num_points=NUM_POINTS)

    def frame(params, pc0, pc1, pc_hist, valid, dt0):
        kw = {} if refine_arg is None else {"refine": refine_arg}
        flow = model.apply(
            params, (pc0, pc1, pc_hist), (valid, valid, valid),
            dts=(dt0, dt0), **kw,
        )
        comp_dis = flow * (dt0 / 0.1)[:, None]
        return pc0 + comp_dis

    CHAIN = 10

    @jax.jit
    def step_chain(params, pc0, pc1, pc_hist, valid, dt0):
        def body(carry, _):
            refined = jax.vmap(frame, in_axes=(None, 0, 0, 0, 0, 0))(
                params, carry, pc1, pc_hist, valid, dt0
            )
            return refined, None

        out, _ = jax.lax.scan(body, pc0, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    rng = np.random.default_rng(0)
    cloud = lambda: jnp.asarray(lidar_like_cloud(rng, BATCH, NUM_POINTS))  # noqa: E731
    pc0, pc1, pc_hist = cloud(), cloud(), cloud()
    n_valid = int(NUM_POINTS * VALID_FRACTION)
    valid = jnp.asarray(np.arange(NUM_POINTS) < n_valid)[None, :].repeat(BATCH, 0)
    dt0 = jnp.asarray(rng.uniform(0, 0.1, size=(BATCH, NUM_POINTS)), jnp.float32)

    t0 = time.perf_counter()
    np.asarray(step_chain(params, pc0, pc1, pc_hist, valid, dt0))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(5):
        start = time.perf_counter()
        np.asarray(step_chain(params, pc0, pc1, pc_hist, valid, dt0))
        times.append(time.perf_counter() - start)
    elapsed = max(float(np.median(times)) - rtt, 1e-9) / CHAIN
    mpts = BATCH * n_valid / elapsed / 1e6
    ms = elapsed * 1e3
    print(
        json.dumps(
            {
                "row": label,
                "mpts_per_s": round(mpts, 3),
                "ms_per_batch": round(ms, 1),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )
    return mpts


def main() -> None:
    import jax

    from himo_tpu.ops.refine import RefineConfig

    # RTT estimate (same protocol as bench.main's tiny probe).
    dev = jax.devices()[0]
    x = jax.device_put(np.float32(1.0), dev)
    probes = []
    for _ in range(10):
        t = time.perf_counter()
        np.asarray(x + 1.0)
        probes.append(time.perf_counter() - t)
    rtt = float(np.median(probes))
    print(json.dumps({"rtt_ms": round(rtt * 1e3, 1)}), flush=True)

    rows = {
        "gate": ("seflowpp_noprior", {"corr_volume": False, "_label": "gate"}, None),
        "corr": ("seflowpp_noprior", {"_label": "corr"}, None),
        "instance": ("seflowpp", {"_label": "instance"}, False),
        "full": ("seflowpp", {"_label": "full"}, True),
        "refine5": (
            "seflowpp",
            {
                "refine": RefineConfig(
                    taus=(2.0, 1.2, 0.7, 0.45, 0.35), accel_iters=(2, 4)
                ),
                "_label": "refine5",
            },
            True,
        ),
        "refine_q2k": (
            "seflowpp",
            {
                "refine": RefineConfig(num_query=2048, num_ref=4096),
                "_label": "refine_q2k",
            },
            True,
        ),
    }
    want = sys.argv[1:] or list(rows)
    for key in want:
        name, overrides, refine_arg = rows[key]
        try:
            measure(name, overrides, refine_arg, rtt)
        except Exception as e:  # keep the sweep alive per row
            print(
                json.dumps({"row": overrides["_label"], "error": repr(e)[:200]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
