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

    if nproc >= 4:
        # Combined batch × level mesh whose LEVEL axis crosses a process
        # boundary (devices [[0,1],[2,3]] → level pairs (0,1)/(2,3) span
        # processes 0-1 / 2-3), running a COMPLETE multistart TRM solve:
        # starts data-parallel over `batch`, every DP contraction
        # tensor-parallel over `level` with all_gathers riding the DCN
        # cluster (VERDICT r3 item 5).
        from mioc_tpu.solvers.trm import TRMParameters
        from mioc_tpu.solvers.trm_device import (
            make_device_trm,
            multistart_solve_device,
        )

        par = TRMParameters(beta=1e-4, p=np.inf, delta0=2.0, maxiter=8)
        S = 4
        x0s = np.stack([rand_func(obj, seed=100 + s) for s in range(S)])

        # Single-process unsharded reference solve on this process's device.
        run_ref = make_device_trm(obj, par, use_pallas=False)
        lv, jc, ops = run_ref.operands
        ref = jax.device_get(
            jax.vmap(run_ref.raw, in_axes=(0, None, None, None))(
                jnp.asarray(x0s), lv, jc, ops))

        mesh_bl = make_device_mesh(batch=2, level=nproc // 2)
        res = multistart_solve_device(obj, par, x0s, mesh=mesh_bl,
                                      dp_backend="sharded")
        for shard in res.u.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          np.asarray(ref.u)[shard.index])
        for shard in res.iterations.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          np.asarray(ref.iterations)[shard.index])
        # Cross-process collective over the solved objectives.
        J_tot = float(jax.jit(jnp.sum)(res.J))
        np.testing.assert_allclose(J_tot, float(np.sum(np.asarray(ref.J))),
                                   rtol=1e-12)
        print(f"multihost worker {pid}/{nproc} combined-mesh full solve OK",
              flush=True)

        # Time-axis (sequence-parallel) temporal DP whose CHUNK axis spans
        # all processes (VERDICT r4 item 7 — the one parallel axis the DCN
        # cluster had not carried): each process composes the chunk
        # operators it owns, the boundary sweep runs on the cross-process
        # all_gather of the operator band, and the recovered suffix tables
        # must equal the locally-computed unsharded tables shard-for-shard.
        from jax.sharding import NamedSharding, PartitionSpec as P2

        from mioc_tpu.ops.bellman import max_budget_use, stage_tables
        from mioc_tpu.ops.levels import jump_cost_table
        from mioc_tpu.parallel.temporal import (
            temporal_tables,
            temporal_tables_sharded,
        )

        adm = obj.admissible
        levels_t = jnp.asarray(adm.levels, jnp.float64)
        jump_t = jnp.asarray(
            jump_cost_table(np.asarray(adm.levels), p=np.inf, beta=1e-4))
        rng = np.random.default_rng(7)
        grad_t = jnp.asarray(rng.normal(size=(obj.nt, obj.nx)))
        u_old_t = jnp.asarray(
            np.asarray(adm.levels)[rng.integers(0, adm.L, size=obj.nt)])
        stage_t, btilde_t = stage_tables(grad_t, u_old_t, levels_t, obj.tau)
        B_t, smax_t = 8, max_budget_use(adm.levels)

        mesh_t = make_device_mesh(batch=nproc, level=1)
        rep = NamedSharding(mesh_t, P2())
        tts = jax.jit(lambda s, b, j: temporal_tables_sharded(
            s, b, j, B_t, smax_t, mesh_t, axis="batch"))
        phis_sh = tts(jax.device_put(stage_t, rep),
                      jax.device_put(btilde_t, rep),
                      jax.device_put(jump_t, rep))
        phis_ref = np.asarray(
            temporal_tables(stage_t, btilde_t, jump_t, B_t, smax_t))
        for shard in phis_sh.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          phis_ref[shard.index])
        print(f"multihost worker {pid}/{nproc} cross-process time axis OK",
              flush=True)

    print(f"multihost worker {pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    main()
