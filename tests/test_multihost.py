"""Multi-host (DCN) dryrun: 2 jax.distributed CPU processes, 4 virtual
devices each, one global 8-device stream mesh -- cross-HOST global-ID
handoff through the gallery all_gather (SURVEY.md section 5.8; round-1
review: no multi-host story existed)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_host_dryrun_cross_host_handoff():
    port = _free_port()
    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env()
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/dryrun_multihost.py",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--devices-per-host", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out[-3000:]}"
    assert "cross-host (DCN) global-id handoff ok" in outs[1], outs[1][-2000:]
    assert "tracking + collectives ok" in outs[0], outs[0][-2000:]
