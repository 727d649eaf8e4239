"""Multi-host (pod/DCN) helpers: a REAL 2-process run over a TCP
coordinator with Gloo CPU collectives — jax.distributed init, global mesh,
per-host batch slicing, cross-process reduction."""

import socket
import subprocess
import sys
from pathlib import Path

def test_two_process_global_mesh_and_reduction():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    worker = Path(__file__).parent / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "global sum OK 84.0" in out
