"""Multi-host (DCN) execution test: 2-process jax.distributed cluster.

Spawns two worker processes, each with 2 virtual CPU devices, that form
a 4-device global mesh over a localhost coordinator and run the
data-parallel mapping train step with per-process batch shards
(SURVEY.md section 2.10 comm-backend row).
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_training():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["MISO_COORDINATOR"] = f"127.0.0.1:{port}"
        env["MISO_NUM_PROCESSES"] = "2"
        env["MISO_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-4000:]}"
        outs.append(out)
    lines = [next(l for l in o.splitlines() if l.startswith("RANK")) for o in outs]
    # Both ranks computed the SAME global losses (the psum crossed DCN).
    vals = [l.split("LOSSES")[1] for l in lines]
    assert vals[0] == vals[1], f"ranks disagree:\n{lines[0]}\n{lines[1]}"
    # Stage 2: submap-parallel fusion step over the 2D (submap x data)
    # mesh ran and both ranks agree on the global loss.
    fusion = [next(l for l in o.splitlines() if "FUSION" in l) for o in outs]
    f0 = fusion[0].split("FUSION")[1]
    f1 = fusion[1].split("FUSION")[1]
    assert f0 == f1, f"fusion disagree:\n{fusion[0]}\n{fusion[1]}"
