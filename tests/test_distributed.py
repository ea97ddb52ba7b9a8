"""Multi-host bring-up: 2-process CPU cluster through jax.distributed.

Validates the TPU-pod multi-host path (SURVEY.md §8 step 6) without TPU
hardware: two OS processes join via the coordination service, build one
global ('dcn', 'ici') mesh, feed process-local scenario shards, and the
ensemble summary reduces across the DCN (process) axis — both processes must
print identical global statistics.
"""

import os
import re
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own host-device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out
    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d+) (.*)", out)
        assert m, out
        results[m.group(1)] = m.group(2)
    assert len(results) == 2
    # global reduction: both processes computed identical ensemble statistics
    assert results["0"] == results["1"], results
