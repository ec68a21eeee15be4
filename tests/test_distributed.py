"""Multi-process (multi-host bring-up) smoke: jax.distributed on CPU.

The reference has no distributed machinery (SURVEY 2.3); the framework's
multi-host path is jax.distributed.initialize + the ('data', 'seg') mesh
of parallel/sharded.py.  jax supports a multi-process CPU runtime on one
machine, so this test actually EXECUTES that path: two processes, one
CPU device each, a global 2-device mesh, and a sharded batch encode whose
streams must be byte-identical to the host encoder -- the per-lane payload
gather (the codec's one collective) crosses the process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

pytest.importorskip("jax")

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_encode():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"SMOKE-OK {pid}" in out, out
