"""Round-4 chip A/B queue: run every queued kernel experiment in one chip
session (TODO.md perf items), with enough reps that the ±25 ms tunnel noise
cannot fake a winner.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r4.py

Sections (each prints its own lines; all timings median-of-reps with the
~27 ms RTT subtracted — see CLAUDE.md "Environment rules"):
  1. scatter-max BACKWARD route: HIMO_MAXBWD_PALLAS=0 (XLA fused row-take)
     vs 1 (sorted-banded Pallas gather) on the REAL loss-grad graph shape.
  2. NN kernel reference-tile sweep: HIMO_NN_RT in {256, 512, 1024} on the
     fused masked-min loss shape (16k x 16k, B=8).
  3. End-to-end fleet throughput (bench.measure_fleet_e2e) with the
     scene-parallel producer: prior-conditioned flagship AND noprior.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

REPS = 7


def _run_env(section: str, env: dict) -> None:
    """Each config runs in a FRESH interpreter (module-level RT constants
    and lru_caches bake the env at import)."""
    e = dict(os.environ)
    e.update(env)
    e["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, __file__, section],
        env=e, capture_output=True, text=True, timeout=1800,
    )
    tail = "\n".join(
        ln for ln in r.stdout.splitlines() if ln.startswith("[")
    )
    print(f"--- {section} {env} ({time.time() - t0:.0f}s)\n{tail}")
    if r.returncode != 0:
        print(r.stderr[-800:])


def _rtt(jax, jnp):
    @jax.jit
    def tiny(x):
        return x + 1.0

    np.asarray(tiny(jnp.ones(())))
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(tiny(jnp.ones(())))
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def section_maxbwd() -> None:
    """Scatter fwd+bwd at the training shape, current env routing."""
    import jax
    import jax.numpy as jnp

    from himo_tpu.ops.voxelize import PillarConfig, scatter_max, voxelize_pillars

    rtt = _rtt(jax, jnp)
    B, N, C = 8, 65536, 32
    pillar = PillarConfig()  # 512x512
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.uniform(-50, 50, (B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    valid = jnp.ones((B, N), bool)

    def one(pc_b, feat_b, valid_b):
        grid = voxelize_pillars(pc_b, valid_b, pillar)
        img = scatter_max(feat_b, grid)
        return jnp.sum(img * img)

    @jax.jit
    def fwdbwd(pc, feats, valid):
        def body(carry, _):
            l, g = jax.value_and_grad(
                lambda f: jax.vmap(one)(pc, f, valid).sum()
            )(carry)
            return carry + 1e-6 * g, l

        out, ls = jax.lax.scan(body, feats, None, length=5)
        return jnp.sum(out[0, 0]) + ls.sum()

    np.asarray(fwdbwd(pc, feats, valid))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fwdbwd(pc, feats, valid))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - rtt) / 5
    print(f"[maxbwd HIMO_MAXBWD_PALLAS={os.environ.get('HIMO_MAXBWD_PALLAS', '0')}] "
          f"fwd+bwd {1e3 * t:.1f} ms/step (B{B} N{N} C{C}, median of {REPS})")


def section_nn() -> None:
    """Fused masked-min NN loss shape at the current HIMO_NN_RT."""
    import jax
    import jax.numpy as jnp

    from himo_tpu.ops.nn import nn_distance_sq

    rtt = _rtt(jax, jnp)
    B, N, M = 8, 16384, 16384
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-50, 50, (B, N, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(-50, 50, (B, M, 3)), jnp.float32)
    vq = jnp.ones((B, N), bool)
    vr = jnp.ones((B, M), bool)

    @jax.jit
    def chain(q, r, vq, vr):
        def body(carry, _):
            d = jax.vmap(nn_distance_sq)(carry, r, vq, vr)
            return carry * 0.999 + 1e-5 * d[..., None], jnp.sum(d)

        out, ds = jax.lax.scan(body, q, None, length=5)
        return jnp.sum(out[0, 0]) + ds.sum()

    np.asarray(chain(q, r, vq, vr))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chain(q, r, vq, vr))
        ts.append(time.perf_counter() - t0)
    t = (np.median(ts) - rtt) / 5
    print(f"[nn HIMO_NN_RT={os.environ.get('HIMO_NN_RT', '512')}] "
          f"min pass {1e3 * t:.1f} ms (B{B} {N}x{M}, median of {REPS})")


def section_fleet(flag: str) -> None:
    import bench

    v = bench.measure_fleet_e2e()
    print(f"[fleet model={flag}] {v / 1e6:.3f} Mpts/s end-to-end")


def main() -> None:
    if len(sys.argv) > 1:
        sec = sys.argv[1]
        if sec == "maxbwd":
            section_maxbwd()
        elif sec == "nn":
            section_nn()
        elif sec == "fleet":
            section_fleet(os.environ.get("HIMO_FLEET_MODEL", "seflowpp"))
        return
    for v in ("0", "1"):
        _run_env("maxbwd", {"HIMO_MAXBWD_PALLAS": v})
    for rt in ("256", "512", "1024"):
        _run_env("nn", {"HIMO_NN_RT": rt})
    _run_env("fleet", {})


if __name__ == "__main__":
    main()
