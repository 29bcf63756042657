"""2-process ``jax.distributed`` CPU test (SURVEY.md §5: the multi-host path).

Spawns two coordinated worker processes, each with 4 virtual CPU devices,
solving one 16-instance sweep sharded over the 8 global devices. Verifies
both workers converge every local instance and agree on the global objective
sum computed through an actual cross-process collective.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER {pid} ok=True" in out, out
    sums = []
    for out in outs:
        m = re.search(r"globalsum=([-\d.]+)", out)
        assert m, out
        sums.append(float(m.group(1)))
    # both processes must see the same globally-reduced objective
    assert abs(sums[0] - sums[1]) < 1e-9, sums
    # segment-sharded giant instance across the process boundary: both
    # processes converge it and agree on the objective
    seg = []
    for out in outs:
        m = re.search(r"seg_status=(\d+) seg_obj=([-\d.]+)", out)
        assert m, out
        assert int(m.group(1)) == 1, out   # SOLVED
        seg.append(float(m.group(2)))
    assert abs(seg[0] - seg[1]) < 1e-9, seg
    # hybrid instance×segment: both processes converge their local (nominal)
    # instances and — instances being identical — agree on the local obj sum
    hyb = []
    for out in outs:
        m = re.search(r"hybrid_ok=(\w+) hybrid_objsum=([-\d.]+)", out)
        assert m, out
        assert m.group(1) == "True", out
        hyb.append(float(m.group(2)))
    assert abs(hyb[0] - hyb[1]) < 1e-9, hyb
    # hybrid local sum = 2 nominal instances; segment solve = same problem
    assert abs(hyb[0] / 2.0 - seg[0]) < 1e-8, (hyb, seg)
