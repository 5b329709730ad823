"""Two-process jax.distributed Gram build (DCN path, CPU backend).

Spawns two coordinator-connected processes with 4 virtual devices each and
runs the sharded build over the resulting 8-device global mesh — the
multi-controller configuration the reference reached only on real Slurm
allocations (runs/runtime_scaling/slurm_scripts/32gpus.sh).
"""

import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_gram():
    worker = pathlib.Path(__file__).parent / "_mp_worker.py"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"proc {i}/2: OK" in out, out
