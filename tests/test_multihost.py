"""Multi-process (DCN) execution smoke test for ``init_multihost``.

Spawns two local CPU processes that form a real ``jax.distributed`` cluster
(coordinator on 127.0.0.1) and run one batch-sharded TRM step with a
cross-process reduction, each asserting its shard equals an unsharded local
reference (``tests/_multihost_worker.py``).  This is the closest a single
machine gets to multi-host TPU scale-out (SURVEY.md §5; VERDICT r2 item 5).
"""

import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError as exc:  # pragma: no cover - constrained sandboxes
            pytest.skip(f"cannot bind a localhost port: {exc}")
        return s.getsockname()[1]


def _run_cluster(nproc: int, timeout: float = 360):
    port = _free_port()
    env = {
        **os.environ,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        # one CPU device per process — the distributed cluster provides the
        # multi-device view, not the local XLA flag
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        # workers run with cwd=tests/ — make the package importable even when
        # the repo is not pip-installed in the current environment
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(_HERE)] +
            ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
        ),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "_multihost_worker.py"),
             str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=_HERE,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"multihost worker {pid}/{nproc} OK" in out
    return outs


@pytest.mark.slow
def test_two_process_distributed_trm_step():
    _run_cluster(2)


@pytest.mark.slow
def test_four_process_combined_mesh_full_solve():
    """4-process DCN cluster: a (batch=2, level=2) mesh whose level axis
    crosses a process boundary runs a COMPLETE multistart TRM solve — starts
    data-parallel over ``batch``, every DP contraction tensor-parallel over
    ``level`` — with per-shard equality against single-process solves
    (VERDICT r3 item 5)."""
    outs = _run_cluster(4)
    for pid, out in enumerate(outs):
        assert f"multihost worker {pid}/4 combined-mesh full solve OK" in out
        # Sequence-parallel stage: the temporal DP's chunk axis spans all
        # four processes; suffix tables equal the unsharded ones per shard
        # (VERDICT r4 item 7).
        assert f"multihost worker {pid}/4 cross-process time axis OK" in out
