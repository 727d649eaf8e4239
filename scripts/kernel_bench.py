"""Repeatable chip microbench for the TODO.md kernel A/Bs.

Times the hot kernels at the 512^2-training shapes on the default device,
honoring the env knobs they A/B:

- pillar scatter-max forward + backward (HIMO_MAXBWD_PALLAS routes the
  max-backward's fused row-take through the Pallas gather vs XLA take);
- the NN loss kernels: plain min pass vs the min+argmin pass
  (HIMO_NN_RT sweeps the reference tile).

Timing follows the CLAUDE.md rules for the axon tunnel: K dependent
iterations per dispatch inside one jit, scalar readback with np.asarray,
median-of-5, RTT subtracted. Prints one line per measurement:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_bench.py
"""

from __future__ import annotations

import os
import time

import numpy as np

B = 8
N = 65536
ROWS = 512 * 512
C = 33
CHAIN = 8


def _rtt(jnp, jax):
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


def _time(fn, *args, rtt=0.0):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t)
    return max(float(np.median(ts)) - rtt, 1e-9) / CHAIN


def main():
    import jax
    import jax.numpy as jnp

    from himo_tpu.ops.nn import nn_argmin, nn_distance_sq
    from himo_tpu.ops.voxelize import PillarConfig, voxelize_pillars

    rtt = _rtt(jnp, jax)
    print(f"device={jax.devices()[0].platform} rtt={1e3 * rtt:.1f} ms")
    rng = np.random.default_rng(0)

    # ---- scatter fwd+bwd at training shapes (B, N, C) -> 512^2 rows
    pc = jnp.asarray(rng.uniform(-50, 50, (B, N, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, N)) < 0.92)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    pillar = PillarConfig(voxel_size=(0.2, 0.2))

    from himo_tpu.ops.voxelize import scatter_max

    def one_scatter(p, v, f):
        return scatter_max(f, voxelize_pillars(p, v, pillar))

    @jax.jit
    def scatter_chain(pc, valid, feats):
        def body(f, _):
            img = jax.vmap(one_scatter)(pc, valid, f)
            # feed a slice of the image back into feats: real dependency
            f2 = f + img[:, 0, 0, 0].reshape(B, 1, 1) * 1e-9
            return f2, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(scatter_chain, pc, valid, feats, rtt=rtt)
    print(f"scatter_max fwd (B{B} N{N} C{C} rows{ROWS}): {1e3 * t:.1f} ms "
          f"= {1e9 * t / (B * N):.1f} ns/pt")

    @jax.jit
    def scatter_grad_chain(pc, valid, feats):
        def loss(f):
            img = jax.vmap(one_scatter)(pc, valid, f)
            return jnp.sum(img * img)

        def body(f, _):
            g = jax.grad(loss)(f)
            return f + 1e-12 * g, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(scatter_grad_chain, pc, valid, feats, rtt=rtt)
    print(f"scatter_max fwd+bwd (MAXBWD_PALLAS="
          f"{os.environ.get('HIMO_MAXBWD_PALLAS', '0')}): {1e3 * t:.1f} ms")

    # ---- NN kernels at loss shapes (16k x 16k)
    q = jnp.asarray(rng.uniform(-50, 50, (B, 16384, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(-50, 50, (B, 16384, 3)), jnp.float32)
    vq = jnp.asarray(rng.uniform(size=(B, 16384)) < 0.92)
    vr = jnp.asarray(rng.uniform(size=(B, 16384)) < 0.92)

    @jax.jit
    def min_chain(q, r, vq, vr):
        def body(c, _):
            d = jax.vmap(nn_distance_sq)(c, r, vq, vr)
            return c + d[..., None] * 1e-12, None

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    @jax.jit
    def argmin_chain(q, r, vq, vr):
        def body(c, _):
            d, ix = jax.vmap(nn_argmin)(c, r, vq, vr)
            return c + (d + ix)[..., None] * 1e-12, None

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t_min = _time(min_chain, q, r, vq, vr, rtt=rtt)
    t_arg = _time(argmin_chain, q, r, vq, vr, rtt=rtt)
    print(f"nn min pass (B{B} 16k x 16k, RT={os.environ.get('HIMO_NN_RT', 'default')}): "
          f"{1e3 * t_min:.1f} ms; min+argmin: {1e3 * t_arg:.1f} ms "
          f"(ratio {t_arg / t_min:.2f})")


if __name__ == "__main__":
    main()
