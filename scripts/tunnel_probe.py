"""Measure the axon tunnel's RTT and effective bandwidth (round-5 verdict
#2 evidence): the e2e fleet gap decomposes into host stages (measured
~63 ms/frame on CPU), device compute (~11-42 ms/frame from the chained-scan
headline), and the tunnel round trip — this script pins the last one.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tunnel_probe.py

Method: np.asarray readbacks force real completion (block_until_ready acks
early through the tunnel). Upload is timed by shipping a fresh host array
and reading back a scalar reduction (adds one RTT + trivial compute);
download by reading back a resident device array (one RTT).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]

    @jax.jit
    def reduce_sum(x):
        return jnp.sum(x)

    # RTT: tiny round trip.
    np.asarray(reduce_sum(jnp.ones(8)))
    rtts = []
    for _ in range(10):
        t = time.perf_counter()
        np.asarray(reduce_sum(jnp.ones(8)))
        rtts.append(time.perf_counter() - t)
    rtt = float(np.median(rtts))

    out = {"rtt_ms": round(rtt * 1e3, 1)}

    for mb in (2, 8, 32):
        x = np.random.default_rng(0).random((mb * 1024 * 1024 // 4,), np.float32)
        # Upload: host -> device, then a scalar readback proves arrival.
        ups = []
        for _ in range(3):
            t = time.perf_counter()
            xd = jax.device_put(x, dev)
            np.asarray(reduce_sum(xd))
            ups.append(time.perf_counter() - t)
        up = max(float(np.median(ups)) - rtt, 1e-9)
        # Download: device -> host.
        downs = []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(xd)
            downs.append(time.perf_counter() - t)
        down = max(float(np.median(downs)) - rtt, 1e-9)
        out[f"up_{mb}mb_s"] = round(up, 3)
        out[f"up_{mb}mb_MBps"] = round(mb / up, 1)
        out[f"down_{mb}mb_s"] = round(down, 3)
        out[f"down_{mb}mb_MBps"] = round(mb / down, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
