"""Worker process for the 2-process jax.distributed smoke test.

Launched by ``tests/test_multihost.py`` as ``python _multihost_worker.py
<process_id> <num_processes> <port>``.  Each process contributes one CPU
device; together they form a 2-device DCN "cluster" (the local stand-in for
multi-host TPU scale-out, SURVEY.md §5 distributed-communication notes).

The worker runs one batch-sharded TRM step (gradient sweep + DP build +
backtrack + trial eval) on a global ``(batch=2, level=1)`` mesh, reduces the
trial objectives with a cross-process sum (the psum-carrying collective), and
checks its addressable output shard against a locally-computed unsharded
reference — i.e. multi-process execution changes nothing but the placement.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # never touch the TPU tunnel here

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import numpy as np
    import jax.numpy as jnp

    from mioc_tpu.parallel import (
        init_multihost,
        make_device_mesh,
        make_ode_trm_step,
    )

    idx, cnt = init_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert (idx, cnt) == (pid, nproc), (idx, cnt)
    assert len(jax.devices()) == nproc, jax.devices()

    from mioc_tpu.models import LVMObj
    from mioc_tpu.utils.init import rand_func

    obj = LVMObj(nt=32)
    u0 = np.stack([rand_func(obj, seed=s) for s in range(nproc)])

    # Unsharded local reference first (runs fully on this process's device).
    step_ref = make_ode_trm_step(obj, beta=1e-4, p=np.inf, delta0=2.0)
    u_ref, J_ref, _ = step_ref(jnp.asarray(u0))
    u_ref, J_ref = np.asarray(u_ref), np.asarray(J_ref)

    # Global batch-sharded step: one scenario per PROCESS over DCN.
    mesh = make_device_mesh(batch=nproc, level=1)
    step = make_ode_trm_step(obj, beta=1e-4, p=np.inf, delta0=2.0, mesh=mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    u_g = jax.device_put(jnp.asarray(u0), NamedSharding(mesh, P("batch")))
    u_new, J_new, _ = step(u_g)

    # Cross-process collective: global sum of the sharded trial objectives.
    J_total = float(jax.jit(jnp.sum)(J_new))
    np.testing.assert_allclose(J_total, J_ref.sum(), rtol=1e-12)

    # This process's shard matches the reference rows it owns.
    for shard in u_new.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), u_ref[shard.index])
    for shard in J_new.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data), J_ref[shard.index],
                                   rtol=1e-12)

    print(f"multihost worker {pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    main()
