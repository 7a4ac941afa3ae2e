"""Multi-controller execution: the domain engine runs across SEPARATE
processes (the real pod model — one controller per host, one global mesh)
and stays bit-exact vs the single-chip engine.

The in-suite 8-device mesh emulates multi-chip within one process; this
test goes further and emulates multi-HOST: two processes x 4 virtual CPU
devices form an 8-device global mesh via ``jax.distributed`` (gloo
collectives stand in for DCN/ICI). It validates the three things only a
multi-controller run can: per-process shard materialization
(``from_cell_state`` via ``make_array_from_callback``), cross-process
collectives in the compiled step, and the per-process sharded checkpoint
(each process writes only the tiles it addresses)."""

import os
import subprocess
import sys

import pytest

PAYLOAD = os.path.join(
    os.path.dirname(__file__), "..", "tools", "multihost_domain.py"
)


def _free_port() -> int:
    # a bound-then-released port: avoids cross-talk when two instances of
    # this test (or another distributed job) run concurrently on the host
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_domain_run_bit_exact(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, PAYLOAD, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert procs[0].returncode == 0, outs[0][-3000:]
    assert procs[1].returncode == 0, outs[1][-3000:]
    assert "MULTIHOST OK" in outs[0], outs[0][-3000:]
