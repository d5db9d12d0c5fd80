"""Multi-host (DCN) execution: a REAL 2-process JAX cluster on CPU.

parallel/mesh.py claims the eval mesh "extends across hosts"; this spawns
two OS processes, each owning 2 virtual CPU devices, joined through
`init_distributed` (jax.distributed + gloo collectives — the DCN stand-in),
and drives the batched-eval shard_map steps over the resulting 4-device
global mesh. Each worker checks its addressable lanes against the
single-device reference (scripts/multihost_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_batched_eval():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        REPO, "tests", ".jax_cache_cpu")
    env.pop("XLA_FLAGS", None)   # worker sets its own 2-device flag

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "multihost_worker.py"),
             str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" +
                    "\n".join(o or "" for o in outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST OK pid={pid} procs=2 devices=4" in out, out[-2000:]
    # the two workers own disjoint lane sets covering all 4
    lanes = sorted(
        out.split("lanes=")[1].strip() for out in outs)
    assert lanes == ["[0, 1]", "[2, 3]"], lanes
