"""Device-resident TRM: the whole trust-region loop inside one jit.

The host-driven loop (:mod:`.trm`) reads the trial objective back to Python
every inner step.  On TPU that synchronization is pure overhead (and on the
axon runtime any device→host readback permanently degrades dispatch latency —
BASELINE_SELF.md), so this variant runs the ENTIRE outer/inner accept-halve
loop as ``lax.while_loop``s on the device: one dispatch and one readback per
solve.  It is also the enabling form for batched multistart
(``jax.vmap`` over starting controls — see :func:`multistart_solve_device`).

Semantics are identical to :func:`mioc_tpu.solvers.trm.trm_solve` (same
accept/halve/certificate logic, same divergences from the Julia reference) —
verified element-for-element against the host loop in ``tests/test_trm_device.py``.
Iteration logging is not available inside the device loop.
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.backtrack_pallas import backtrack_pallas, backtrack_pallas_trials
from ..ops.bellman import backtrack, build_tables, max_budget_use, stage_tables
from ..ops.bellman_pallas import build_tables_pallas, pallas_supported
from ..ops.levels import jump_cost_table
from ..ops.tv import _tv, _tv_rows
from ..utils.init import rand_func

__all__ = ["make_device_trm", "trm_solve_device", "multistart_solve_device"]


class DeviceTRMResult(NamedTuple):
    u: jnp.ndarray         # accepted control (nt, nx)
    x_final: jnp.ndarray   # last candidate iterate (reference's obj.x)
    J: jnp.ndarray         # f + β·TV at the reference's return convention
    f: jnp.ndarray         # smooth objective at the accepted control
    tv: jnp.ndarray        # TV_p of the accepted control
    converged: jnp.ndarray
    iterations: jnp.ndarray
    inner_steps: jnp.ndarray
    f_evals: jnp.ndarray
    # Measured in the device carry (one adjoint sweep / one DP build per outer
    # body).  The host loop's df_evals is one higher: it computes a final
    # reporting gradient after the loop (multi-trust.jl:166-167) that the
    # device loop has no use for.
    df_evals: jnp.ndarray
    dp_builds: jnp.ndarray


_DEVICE_TRM_CACHE: dict = {}


def _iv_rows(grad, u_old, us):
    """Row-wise inner products ``Σ grad·(u_old − us[k]) → (K,)``.  Like
    ``_tv_rows`` (ops/tv.py): row-reduction bits are batch-size invariant on
    TPU for K ≥ 2, so single evaluations route through a duplicated 2-row
    batch and bit-match the trial wave's values — with the row count padded
    to a multiple of 8 so every call site lowers at the SAME width (see
    ``_tv_rows``)."""
    K = us.shape[0]
    Kp = -(-max(K, 2) // 8) * 8
    if Kp != K:
        us = jnp.concatenate(
            [us, jnp.zeros((Kp - K,) + us.shape[1:], us.dtype)])
    return jnp.sum(grad[None] * (u_old[None] - us), axis=(1, 2))[:K]


def _guarded(cond_fn, body_fn):
    """Guarded loop step: apply ``body_fn`` only while ``cond_fn`` holds,
    else pass the carry through unchanged (a full-carry select).  Chains of
    these inside ONE ``while_loop`` iteration trade per-iteration loop
    overhead (condition sync + iteration boundary) for masked over-compute —
    results are bit-identical to the step-per-iteration loop by
    construction, since masked steps select the old carry exactly."""
    def step(c):
        cn = body_fn(c)
        act = cond_fn(c)
        return jax.tree_util.tree_map(
            lambda old, new: jnp.where(act, new, old), c, cn)
    return step


def make_device_trm(obj, par, use_pallas: Optional[bool] = None,
                    outer_chunk=None, speculative: bool = False,
                    dp_backend: Optional[str] = None, mesh=None,
                    wave_chase: str = "vmap", outer_unroll: int = 1,
                    inner_unroll: int = 1):
    """Build a jitted ``solve(x0) -> DeviceTRMResult`` for ``obj`` with
    parameters ``par`` (a TRMParameters).  The returned function contains the
    full TRM; vmap it for batched multistart — with ``use_pallas`` both fused
    kernels batch via their custom_vmap rules (start axis inside one kernel
    invocation).  Compiled solvers are cached per (objective parameters,
    solver parameters) like the sweep cache.

    ``outer_chunk`` segments the solve into dispatches of at most that many
    outer iterations (the carry stays on device; only the stop flag and the
    iteration counter are read back between segments).  Use it for solves
    whose single-dispatch runtime is minutes — e.g. large PDE meshes — where
    one monolithic dispatch can exceed the runtime's execution deadline and
    crash the TPU worker (observed on the axon tunnel at 8321 dofs, nt=200).
    Segmenting is exact: the outer iterations are independent given the
    carry, so results bit-match the single-dispatch solve.

    ``outer_chunk="auto"`` self-tunes: two 2-iteration probe segments measure
    the warm per-iteration time (a conservative running MAX — early
    iterations are cheaper than steady state), then segments are sized to
    ~30 s of device time, growing at most 4× per segment.  Fast solves
    finish in one remainder dispatch after the probes; slow solves stay
    deadline-safe throughout.

    ``speculative=True`` replaces the sequential inner accept/halve loop with
    one BATCHED trial wave: the halving budget schedule is static
    (``B_k = ⌊δ₀/2^{k-1}/Δt⌋`` until it reaches 0, where the zero-budget
    trial returns ``u_old`` and the ``pred ≤ 0`` certificate fires), so all
    candidate trials come from the SAME DP tables — one vmapped backtrack
    chase + one vmapped forward sweep evaluate every candidate at once, and
    the first candidate satisfying the sequential loop's exit condition is
    selected.  Results (accepted iterates, J, certificate, ``u_cand``) are
    identical to the sequential loop up to decision-boundary ulp effects:
    the accept test compares ``ared``/``pred`` built from batched reductions
    whose last-ulp f32 rounding can differ from the sequential scalar
    reductions, so exactly AT the ``σ·pred`` boundary an f32 device may take
    a different (equally certified) branch — bit-exact on CPU f64 and for
    objectives whose batched sweeps are bit-exact per lane
    (``_batched_sweeps_bitexact``).  The ``f_evals``/``inner_steps``
    counters report the SEQUENTIAL-equivalent trial count (the number the
    non-speculative loop performs), so traces stay comparable — the device
    does K sweeps per outer iteration, but batched, which is the point:
    one batched wave replaces ~4-5 sequential trial evaluations and chases
    per outer iteration (fishing nt=1024: 512 wave vs 169 sequential
    iters/s on v5e — BASELINE_SELF.md round 5).

    ``wave_chase`` selects how the wave extracts its trial controls:
    ``"vmap"`` (default — broadcast the tables K-fold and run the
    sublane-parallel batched chase kernel; wins for single solves) or
    ``"trials"`` (stream the shared U planes once through the trial-wave
    kernel; the multistart form, and the PDE-objective preference via
    ``_wave_chase_default``) — measured trade in BASELINE_SELF.md.

    ``outer_unroll``/``inner_unroll`` run that many GUARDED outer bodies /
    inner trials per ``while_loop`` iteration (each step is a full-carry
    select that no-ops once its condition fails, so results are
    bit-identical to the unrolled=1 loop).  Measured round 5: a NO-OP at
    every grid point (0.96-0.99×, benchmarks/multistart_unroll.py) — the
    "while-loop self time" that motivated the knob was a profiling
    artifact (nested spans counted at full duration; the fixed parser in
    benchmarks/dp_roofline.py shows ~zero loop overhead), and a direct
    probe measured device while iterations at ~0 µs even with MB-sized
    carries.  Kept as an experiment knob; defaults stay 1."""
    adm = obj.admissible
    if adm is None or adm.L == 0:
        raise ValueError("Objective has no admissible integer level combinations.")
    dt = obj.tau
    beta, sigma, p = float(par.beta), float(par.sigma), float(par.p)
    kmax, maxiter = int(par.kmax), int(par.maxiter)
    delta0 = float(par.delta0)
    B = int(math.floor(delta0 / dt))
    smax = max_budget_use(adm.levels)
    levels_np = np.asarray(adm.levels)
    if not np.allclose(levels_np, np.round(levels_np)):
        raise ValueError("Admissible levels must be integer-valued.")
    jump_np = jump_cost_table(levels_np, p, beta=beta, compat_pinf=par.compat_pinf)
    if use_pallas is None:
        use_pallas = par.use_pallas if par.use_pallas is not None else pallas_supported()
    if dp_backend == "sharded":
        # Level-axis tensor parallelism INSIDE the device loop: the DP's
        # min-plus contraction is partitioned over the mesh's ``level`` axis
        # via shard_map (parallel/shard_dp.py — each device owns a block of
        # successor columns, all_gather + first-minimal-shard combine), so
        # the whole while_loop solve runs SPMD with one collective pair per
        # backward time step.  Iterates are bit-identical to the unsharded
        # scan backend (tie-breaks carry global j indices).  VERDICT r3
        # item 4; SURVEY.md §2 parallelism item (iii).
        use_pallas = False
        from ..parallel.device_mesh import make_device_mesh
        from ..parallel.shard_dp import build_tables_sharded, pad_level_axis

        if mesh is None:  # default like trm.py: all devices on the level axis
            mesh = make_device_mesh(batch=1, level=len(jax.devices()))

        _D = mesh.shape["level"]
        _Lpad = -(-adm.L // _D) * _D

        def dp_build(stage, btilde, jump, B, smax):
            U, phi0 = build_tables_sharded(stage, btilde, jump, B, smax, mesh)
            btilde_p = pad_level_axis(stage, btilde, jump, _D, B)[1]
            return U, phi0, btilde_p

        dp_backtrack = backtrack

        def _bt_levels(levels):
            if _Lpad == adm.L:
                return levels
            return jnp.concatenate(
                [levels,
                 jnp.zeros((_Lpad - adm.L, levels.shape[1]), levels.dtype)])
    elif use_pallas:
        # Raw (unsliced) padded tables flow straight from the fused build
        # into the fused chase kernels — XLA otherwise materializes a ~0.6
        # ms slice copy of U inside the TRM loop (profiled: slice.308 +
        # copy.150, benchmarks/multistart_trace.py).  Under vmap the chase
        # dispatches the batched kernel (all starts chased in lockstep
        # vector ops), replacing the vmapped scan backtrack whose tiny
        # per-step dispatches dominated the multistart iteration (~1.75 ms
        # × ~7 chases per outer iteration at ×32 fishing nt=1024).
        def dp_build(stage, btilde, jump, B, smax):
            U, phi0 = build_tables_pallas(stage, btilde, jump, B, smax,
                                          raw_u=True)
            return U, phi0, btilde

        dp_backtrack = backtrack_pallas
        _bt_levels = lambda levels: levels
    else:
        def dp_build(stage, btilde, jump, B, smax):
            U, phi0 = build_tables(stage, btilde, jump, B, smax)
            return U, phi0, btilde

        dp_backtrack = backtrack
        _bt_levels = lambda levels: levels

    # Objectives without a state cache (e.g. ConvObj) return aux None from the
    # forward sweep; the while-loop carry needs an array, so a dummy is
    # substituted.  None-ness is static per objective — probe it without
    # compiling anything.
    _sweep_ops0 = obj._sweep_ops()
    _u_spec = jax.ShapeDtypeStruct((obj.nt, obj.nx), jnp.asarray(levels_np).dtype
                                   if getattr(obj, "dtype", None) is None
                                   else np.dtype(obj.dtype))
    _ys_is_none = jax.eval_shape(
        lambda u, ops: obj._forward_with(u, ops), _u_spec, _sweep_ops0
    )[1] is None
    _has_fwd_batch = getattr(obj, "_forward_batch_ops", None) is not None

    def _fwd_adj(x0, sweep_ops):
        forward = lambda u: obj._forward_with(u, sweep_ops)
        adjoint = lambda u, ys: obj._adjoint_with(u, ys, sweep_ops)
        if _ys_is_none:
            return (lambda u: (forward(u)[0], jnp.zeros((1,), x0.dtype)),
                    lambda u, ys: adjoint(u, None))
        return forward, adjoint

    def init_carry(x0, levels, jump, sweep_ops):
        x0 = x0.astype(levels.dtype)
        fwd, _ = _fwd_adj(x0, sweep_ops)
        f0, ys0 = fwd(x0)
        tv0 = _tv(x0, p)
        # J_ret starts at +inf like the reference's J (multi-trust.jl:80):
        # it only becomes finite on an accepted step or the certificate.
        return (x0, ys0, f0, tv0, x0, jnp.asarray(jnp.inf, x0.dtype),
                jnp.bool_(False), jnp.int32(1), jnp.int32(0), jnp.int32(1),
                jnp.int32(0), jnp.int32(0))

    # Static speculative halving schedule: δ₀, δ₀/2, … until the budget
    # floors to 0 (that trial is u_old itself — pred = 0 fires the
    # certificate, so the sequential loop can never go past it), capped at
    # kmax like the sequential loop.  Computed in the OBJECTIVE dtype's
    # arithmetic: the sequential loop floors a carried δ of that dtype
    # (f32 on TPU), and for δ/Δt near an integer a Python-f64 floor could
    # differ by 1, silently chasing a different budget than the sequential
    # loop (ADVICE round 3).
    _sdtype = np.dtype(getattr(obj, "dtype", None) or np.float64)
    _B_sched = []
    _d = np.asarray(delta0, _sdtype)
    _dt = np.asarray(dt, _sdtype)
    for _ in range(kmax):
        _Bk = int(np.floor(_d / _dt))
        _B_sched.append(_Bk)
        if _Bk == 0:
            break
        _d = (_d / _sdtype.type(2.0)).astype(_sdtype)
    K_spec = len(_B_sched)

    def run_outer(c0, it_hi, levels, jump, sweep_ops):
        fwd, adj = _fwd_adj(c0[0], sweep_ops)
        levels_bt = _bt_levels(levels)

        # Outer carry:
        #   u_old, ys_old (state cache at u_old), J_old, TV_old, u_cand,
        #   J_ret, stop, it, inner_total, f_evals, df_evals, dp_builds
        def outer_cond(c):
            (_, _, _, _, _, _, stop, it, _, _, _, _) = c
            return (~stop) & (it <= it_hi)

        def outer_body_speculative(c):
            (u_old, ys_old, J_old, TV_old, u_cand, J_ret, stop, it, inner_total,
             f_evals, df_evals, dp_builds) = c
            grad, _ = adj(u_old, ys_old)
            df_evals = df_evals + 1
            stage, btilde = stage_tables(grad, u_old, levels, dt)
            U, phi0, btilde_bt = dp_build(stage, btilde, jump, B, smax)
            dp_builds = dp_builds + 1

            # One batched trial wave over the whole halving schedule.  On the
            # Pallas path the trial-wave chase kernel streams the shared U
            # planes ONCE for all K (and, under the multistart vmap, all S·K)
            # pointer chases; the scan path vmaps the backtrack (the tables
            # broadcast lazily there).
            # Chase strategy, chosen by the measured shape trade
            # (benchmarks round 4): "vmap" broadcasts the tables K-fold and
            # chases them with the sublane-parallel batched kernel — wins
            # for SINGLE solves, where the broadcast DMA (~K·|U|) is cheaper
            # than the trial kernel's statically-unrolled per-trial ops
            # (fishing ×1: 149.1 vs 115.8 iters/s).  "trials" streams the
            # shared U planes once for all (S·K) pointer chases — the
            # multistart form, where a (S·K)-fold broadcast would move GBs
            # per outer iteration (heat ×8: 1.06× with bit-matching
            # controls).
            B_ks = jnp.asarray(_B_sched, jnp.int32)
            if use_pallas and wave_chase == "trials":
                us, _ = backtrack_pallas_trials(U, phi0, btilde_bt, levels_bt,
                                                B_ks)
            else:
                us, _ = jax.vmap(dp_backtrack,
                                 in_axes=(None, None, None, None, 0))(
                    U, phi0, btilde_bt, levels_bt, B_ks)
            # Row-wise decision reductions: the sequential body computes
            # the same quantities through duplicated 2-row batches of these
            # functions, so the wave's values bit-match its (row-reduction
            # bits are batch-size invariant on TPU for K >= 2 — ops/tv.py).
            int_vals = dt * _iv_rows(grad, u_old, us)
            TV_news = _tv_rows(us, p)
            if _has_fwd_batch and K_spec >= 2:
                # Batch-shaped forward (dense PDE / conv): per-row bits
                # equal the sequential loop's single evaluation, which
                # itself runs as a duplicated 2-row batch of the same
                # function — see objectives/pde.py.  ys comes back
                # TIME-major (nt+1, K, N): trials live on axis 1.
                J_news, ys_b = obj._forward_batch_with(us, sweep_ops)
                _ys_trial_axis = 1
                ys_news = (jnp.zeros((1, K_spec), us.dtype)
                           if _ys_is_none else ys_b)
            else:
                J_news, ys_news = jax.vmap(fwd)(us)
                _ys_trial_axis = 0

            pred_k = int_vals + beta * (TV_old - TV_news)
            ared_k = jnp.where(
                jnp.isfinite(J_news),
                J_old - J_news + beta * (TV_old - TV_news),
                -jnp.inf,
            )
            optimal_k = pred_k <= 0
            good_k = (~optimal_k) & (ared_k >= sigma * pred_k)
            # Exact sequential exit condition: the loop leaves iteration k on
            # `done` (optimal|good) OR when `ared_k < σ·pred_k` is False —
            # the latter differs only when pred/ared is NaN (NaN comparisons
            # are False), which must exit WITHOUT accepting, like the
            # sequential loop does.
            exit_k = optimal_k | good_k | ~(ared_k < sigma * pred_k)
            has = jnp.any(exit_k)
            sel = jnp.where(has, jnp.argmax(exit_k), K_spec - 1)
            optimal = has & optimal_k[sel]
            good = has & good_k[sel]
            u = us[sel]
            ys_new = (ys_news[:, sel] if _ys_trial_axis == 1
                      else ys_news[sel])
            J_new = J_news[sel]
            TV_new = TV_news[sel]

            u_old_n = jnp.where(good, u, u_old)
            ys_old_n = jnp.where(good, ys_new, ys_old)
            J_old_n = jnp.where(good, J_new, J_old)
            TV_old_n = jnp.where(good, TV_new, TV_old)
            stop_n = stop | optimal
            J_ret_n = jnp.where(optimal, J_old,
                                jnp.where(good, J_new, J_ret))
            # Sequential-equivalent trial count (see docstring).
            n_trials = sel.astype(jnp.int32) + 1
            return (u_old_n, ys_old_n, J_old_n, TV_old_n, u, J_ret_n, stop_n,
                    it + 1, inner_total + n_trials, f_evals + n_trials,
                    df_evals, dp_builds)

        def outer_body(c):
            (u_old, ys_old, J_old, TV_old, u_cand, J_ret, stop, it, inner_total,
             f_evals, df_evals, dp_builds) = c
            grad, _ = adj(u_old, ys_old)
            df_evals = df_evals + 1
            stage, btilde = stage_tables(grad, u_old, levels, dt)
            U, phi0, btilde_bt = dp_build(stage, btilde, jump, B, smax)
            dp_builds = dp_builds + 1

            # Measured round-5 negative — pre-chasing all halving trials in
            # ONE trial-wave kernel pass per outer (the sequential loop's
            # budgets follow the STATIC schedule, so its trials are known
            # up front): bit-identical, but the Kt-unrolled trials kernel
            # is ISSUE-bound at exactly the cost of the ~7.5 separate
            # latency-bound chases it replaces (2.82 ms vs 7.5 × 0.33 ms
            # per ×32 outer, xplane-verified) — the chase work is
            # irreducible at this shape from either direction, so the
            # simpler per-trial chase stays.

            # Inner carry: k, delta, ared, pred, done, accepted state…
            def inner_cond(t):
                (k, _, ared, pred, done, *_) = t
                return (~done) & (ared < sigma * pred) & (k <= kmax)

            def inner_body(t):
                (k, delta, ared, pred, done, u_old, ys_old, J_old, TV_old,
                 u_cand, J_ret, stop, inner_total, f_evals) = t
                B_k = jnp.floor(delta / dt).astype(jnp.int32)
                u, _ = dp_backtrack(U, phi0, btilde_bt, levels_bt, B_k)
                int_val = dt * _iv_rows(grad, u_old,
                                        jnp.stack([u, u]))[0]
                TV_new = _tv(u, p)
                J_new, ys_new = fwd(u)
                f_evals = f_evals + 1
                inner_total = inner_total + 1

                pred_n = int_val + beta * (TV_old - TV_new)
                ared_n = jnp.where(
                    jnp.isfinite(J_new),
                    J_old - J_new + beta * (TV_old - TV_new),
                    -jnp.inf,
                )

                optimal = pred_n <= 0            # stationarity certificate
                good = (~optimal) & (ared_n >= sigma * pred_n)

                # Accept on good step (multi-trust.jl:148-157).
                u_old_n = jnp.where(good, u, u_old)
                ys_old_n = jnp.where(good, ys_new, ys_old)
                J_old_n = jnp.where(good, J_new, J_old)
                TV_old_n = jnp.where(good, TV_new, TV_old)
                # Candidate iterate (the reference's obj.x) is always u.
                delta_n = jnp.where(good | optimal, delta, delta / 2.0)
                stop_n = stop | optimal
                J_ret_n = jnp.where(optimal, J_old, jnp.where(good, J_new, J_ret))
                done_n = done | optimal | good
                return (k + 1, delta_n, ared_n, pred_n, done_n, u_old_n,
                        ys_old_n, J_old_n, TV_old_n, u, J_ret_n, stop_n,
                        inner_total, f_evals)

            t0 = (jnp.int32(1), jnp.asarray(delta0, u_old.dtype),
                  jnp.asarray(0.0, u_old.dtype), jnp.asarray(1.0, u_old.dtype),
                  jnp.bool_(False), u_old, ys_old, J_old, TV_old, u_cand,
                  J_ret, stop, inner_total, f_evals)
            if inner_unroll > 1:
                g = _guarded(inner_cond, inner_body)

                def inner_chunk(t):
                    for _ in range(inner_unroll):
                        t = g(t)
                    return t

                inner_run = lambda: jax.lax.while_loop(inner_cond, inner_chunk,
                                                       t0)
            else:
                inner_run = lambda: jax.lax.while_loop(inner_cond, inner_body,
                                                       t0)
            (k, _, ared, pred, done, u_old, ys_old, J_old, TV_old, u_cand,
             J_ret, stop, inner_total, f_evals) = inner_run()
            return (u_old, ys_old, J_old, TV_old, u_cand, J_ret, stop, it + 1,
                    inner_total, f_evals, df_evals, dp_builds)

        body = outer_body_speculative if speculative else outer_body
        if outer_unroll > 1:
            g = _guarded(outer_cond, body)

            def chunk(c):
                for _ in range(outer_unroll):
                    c = g(c)
                return c

            return jax.lax.while_loop(outer_cond, chunk, c0)
        return jax.lax.while_loop(outer_cond, body, c0)

    def finalize(c):
        (u_old, ys_old, J_old, TV_old, u_cand, J_ret, stop, it, inner_total,
         f_evals, df_evals, dp_builds) = c
        # Reference return convention: J_accepted + β·TV(final candidate)
        # (multi-trust.jl:169 evaluates TV on obj.x, the last DP candidate).
        return DeviceTRMResult(
            u=u_old,
            x_final=u_cand,
            J=J_ret + beta * _tv(u_cand, p),
            f=J_old,
            tv=TV_old,
            converged=stop,
            iterations=it - 1,
            inner_steps=inner_total,
            f_evals=f_evals,
            df_evals=df_evals,
            dp_builds=dp_builds,
        )

    def solve(x0, levels, jump, sweep_ops):
        c0 = init_carry(x0, levels, jump, sweep_ops)
        c = run_outer(c0, jnp.int32(maxiter), levels, jump, sweep_ops)
        return finalize(c)

    from ..objectives.ode import _params_key

    mesh_sig = None
    if mesh is not None:
        mesh_sig = (tuple(mesh.axis_names), tuple(mesh.shape.items()),
                    tuple(d.id for d in mesh.devices.flat))
    cache_key = (
        type(obj), _params_key(obj), beta, sigma, p, kmax, maxiter, delta0,
        bool(par.compat_pinf), bool(use_pallas), bool(speculative),
        dp_backend, mesh_sig, wave_chase, int(outer_unroll),
        int(inner_unroll),
    )
    jits = _DEVICE_TRM_CACHE.get(cache_key)
    if jits is None:
        jits = {
            "solve": jax.jit(solve),
            "init": jax.jit(init_carry),
            "outer": jax.jit(run_outer),
            "final": jax.jit(finalize),
        }
        _DEVICE_TRM_CACHE[cache_key] = jits
    solve_jit = jits["solve"]
    levels = jnp.asarray(levels_np, dtype=getattr(obj, "dtype", None))
    jump = jnp.asarray(jump_np, dtype=levels.dtype)
    sweep_ops = _sweep_ops0

    def run(x0, progress=None, on_segment=None):
        x0 = jnp.asarray(x0, dtype=levels.dtype)
        if not outer_chunk:
            return solve_jit(x0, levels, jump, sweep_ops)
        c0 = jits["init"](x0, levels, jump, sweep_ops)
        c = _segmented_loop(
            jits["outer"], c0, (levels, jump, sweep_ops), outer_chunk, maxiter,
            read_state=lambda c: (c[6], c[7]), progress=progress,
            on_segment=on_segment,
        )
        return jits["final"](c)

    run.raw = solve_jit
    run.pieces = (init_carry, run_outer, finalize)
    run.jits = jits
    run.maxiter = maxiter
    run.operands = (levels, jump, sweep_ops)
    return run


_PROBE, _TARGET_S = 2, 30.0


def _segmented_loop(outer_jit, c, operands, outer_chunk, maxiter, read_state,
                    progress=None, on_segment=None):
    """Drive a jitted ``outer(carry, it_hi, *operands) -> carry`` in bounded
    dispatches until the stop flag is set or ``maxiter`` is exceeded.

    ``read_state(c)`` returns the (stop, it) leaves of the carry — arrays for
    a vmapped carry, in which case a segment ends when ALL lanes stopped and
    the iteration counter is the lane maximum.  ``progress(it, elapsed_s)``
    (optional) is called after every segment; ``on_segment(carry)`` (optional)
    receives the raw device carry — e.g. for crash-recovery checkpoints."""
    auto = outer_chunk == "auto"
    it = 1  # init_carry starts at iteration 1
    per_iter = None
    last_done = None
    while True:
        if not auto:
            chunk = outer_chunk
        elif per_iter is None:
            chunk = _PROBE
        else:
            # Size segments to ~_TARGET_S of device time.  If that covers
            # the remaining iterations this finishes in one dispatch (the
            # fast-solve path costs just the two probe boundaries).  Grow
            # at most 4× per segment: a single early measurement can
            # underestimate (see below), and an oversized dispatch is the
            # failure mode this mode exists to prevent.
            chunk = max(1, int(_TARGET_S / per_iter))
            if last_done:
                chunk = min(chunk, 4 * last_done)
        it_hi = jnp.int32(min(it + chunk - 1, maxiter))
        t0 = time.perf_counter()
        c = outer_jit(c, it_hi, *operands)
        stop_v, it_v = jax.device_get(read_state(c))
        elapsed = time.perf_counter() - t0
        stop, new_it = bool(np.all(stop_v)), int(np.max(it_v))
        if auto and new_it > it and it > 1:
            # Keep the MAX over segments: early iterations accept on the
            # first inner trial and underestimate steady-state cost (more
            # halvings → more f-evals per outer iteration later on).  The
            # first segment is skipped: its wall time includes compilation.
            per_iter = max(per_iter or 0.0, elapsed / (new_it - it))
            last_done = new_it - it
        it = new_it
        if progress is not None:
            progress(it - 1, elapsed)
        if on_segment is not None:
            on_segment(c)
        if stop or it > maxiter:
            return c


def trm_solve_device(obj, par=None, x0=None, seed: Optional[int] = None,
                     use_pallas: Optional[bool] = None,
                     outer_chunk="auto", progress=None,
                     speculative: Optional[bool] = None,
                     dp_backend: Optional[str] = None, mesh=None,
                     outer_unroll: int = 1, inner_unroll: int = 1):
    """One device-resident TRM solve; returns a host-side summary dict plus
    the accepted control (single readback at the end — or one two-scalar
    readback per ``outer_chunk`` iterations when segmenting).

    ``outer_chunk`` defaults to ``"auto"`` (adaptive segmenting — protects
    long solves from the runtime execution deadline, see
    :func:`make_device_trm`); pass ``None`` to force one monolithic dispatch
    or an int for a fixed segment length.  ``progress(it, segment_seconds)``
    (optional) is called after every segment — the device loop's substitute
    for the host loop's iteration log.

    Segmented solves honor ``par.checkpoint_path`` (an npz snapshot of the
    accepted control after every segment — restartable crash recovery for
    multi-minute solves, same format as the host loop's) and
    ``par.resume_from``.

    ``speculative`` evaluates the whole trust-region halving schedule as ONE
    batched trial wave per outer iteration instead of a sequential inner
    loop — identical iterates and sequential-equivalent counters (see
    :func:`make_device_trm`).  Default (``None``): enabled when the
    objective declares its batched trial evaluations bit-exact per lane
    (``_batched_sweeps_bitexact``) — true for elementwise-scan ODE sweeps
    (fishing nt=1024: 495 wave vs 166 sequential iters/s on v5e), for
    dense-mode PDE objectives, whose forward always runs through an
    explicit K ≥ 2 batch (per-row MXU bits are batch-size invariant;
    objectives/pde.py) with row-shaped decision reductions — heat nt=500
    measures 244 iters/s vs the sequential loop's 112 with bit-identical
    trajectories (benchmarks/heat_spec_tpu.py) — and, since round 4, for
    the convolution objective, whose batch-shaped quadratic runs the same
    way (~1000 vs 678 iters/s; models/convolution.py).  Objectives whose
    batched sweeps are NOT declared bit-exact (e.g. ELL-format cg/mg PDE
    engines) stay sequential by default: the wave is exact in exact
    arithmetic (bit-identical on CPU f64) but the f32 trajectory can drift
    to a different (equally certified) local optimum — pass ``True`` to
    opt in."""
    from .trm import TRMParameters

    par = par or TRMParameters()
    if x0 is None and par.resume_from:
        from ..utils.io import load_checkpoint

        x0 = load_checkpoint(par.resume_from)["u"]
    if x0 is None:
        x0 = rand_func(obj, seed=seed)
    if speculative is None:
        # Per-objective measured default: _speculative_default overrides the
        # capability flag (e.g. conv is bit-exact under the wave but its
        # trial evaluations are matmul-bound, measured 0.80× — opt-in).
        speculative = bool(getattr(obj, "_speculative_default",
                                   getattr(obj, "_batched_sweeps_bitexact",
                                           False)))
    if dp_backend is None and getattr(par, "dp_backend", None) == "sharded":
        # Honor the host-loop parameter spelling (TRMParameters.dp_backend)
        # so --dp-backend sharded reaches the device loop too.
        dp_backend, mesh = "sharded", mesh if mesh is not None else par.mesh
    run = make_device_trm(obj, par, use_pallas=use_pallas,
                          outer_chunk=outer_chunk, speculative=speculative,
                          dp_backend=dp_backend, mesh=mesh,
                          wave_chase=getattr(obj, "_wave_chase_default",
                                             "vmap"),
                          outer_unroll=outer_unroll,
                          inner_unroll=inner_unroll)
    on_segment = None
    if par.checkpoint_path and outer_chunk:
        from ..utils.io import save_checkpoint

        def on_segment(c):
            u, J, tv, it = jax.device_get((c[0], c[2], c[3], c[7]))
            save_checkpoint(par.checkpoint_path, u=np.asarray(u),
                            delta=float(par.delta0), iteration=int(it) - 1,
                            J=float(J), tv=float(tv))

    profiler = None
    if par.profile_dir:
        import jax.profiler as _jprof

        profiler = _jprof.trace(par.profile_dir)
        profiler.__enter__()
    try:
        res = jax.device_get(run(x0, progress=progress, on_segment=on_segment))
    finally:
        if profiler is not None:
            profiler.__exit__(None, None, None)
    return res


def multistart_solve_device(obj, par, x0s, mesh=None, use_pallas=None,
                            outer_chunk=None, progress=None,
                            speculative: Optional[bool] = None,
                            dp_backend: Optional[str] = None,
                            outer_unroll: Optional[int] = None,
                            inner_unroll: Optional[int] = None):
    """Batched multistart: vmap the device TRM over ``x0s (S, nt, nx)``;
    every start runs its own accept/halve schedule in lockstep hardware.
    Returns the vmapped DeviceTRMResult (one readback).  The fused Pallas DP
    build AND backtrack batch via their custom_vmap rules (start axis folded
    inside one kernel invocation each); pass ``use_pallas=False`` to force
    the XLA-scan DP.

    ``speculative`` evaluates each start's whole halving schedule as ONE
    batched trial wave per outer iteration: the trial axis composes with
    the start axis (one ``(S·K)``-batched chase via the trial-wave kernel,
    ``(S, K)``-batched trial sweeps).  Default (``None``): on only for
    objectives declaring ``_speculative_multistart`` (PDE objectives with
    bit-stable batched sweeps — heat ×8 measures 1.06× with bit-matching
    controls), OFF for ODE multistarts: the start axis already amortizes
    the per-op overhead the wave targets, and the wave's extra trial
    sweeps measured 0.89× at ×32 fishing nt=1024 (the single-solve wave,
    by contrast, is a 4.2× win — benchmarks/multistart_tpu.py round 4).

    With a device ``mesh`` the start axis is sharded over its ``batch`` axis
    (scenario data parallelism across chips).  ``dp_backend="sharded"``
    additionally partitions each start's DP contraction over the mesh's
    ``level`` axis (shard_map inside the vmapped solve) — the combined
    batch × level form: starts data-parallel across batch groups, the hard
    L axis tensor-parallel within each group.

    ``outer_chunk`` (int or ``"auto"``) segments the batched solve into
    bounded dispatches like :func:`make_device_trm` — a segment ends when
    ALL starts have stopped; lanes that stopped early simply idle.  Use it
    when a batch of large PDE solves would exceed the runtime's execution
    deadline in one dispatch.  Default ``None`` keeps the single-dispatch
    behavior (results are identical either way).

    Batched solves default to the fused Pallas kernels on TPU (raw padded
    tables flow build → chase with no intermediate copies): 13.1 vs the
    scan path's 48.6 ms/solve at ×32 fishing nt=1024 on v5e, bit-matching
    controls (round 1 shipped the opposite default — its grid-over-starts
    kernel LOST at 75 ms/solve; the start axis now lives inside one kernel
    invocation for both build and backtrack)."""
    if use_pallas is None:
        use_pallas = par.use_pallas if par.use_pallas is not None \
            else pallas_supported()
    if speculative is None:
        speculative = bool(getattr(obj, "_speculative_multistart", False))
    if outer_unroll is None:
        outer_unroll = 1
    if inner_unroll is None:
        inner_unroll = 1
    run = make_device_trm(obj, par, use_pallas=use_pallas,
                          speculative=speculative,
                          dp_backend=dp_backend, mesh=mesh,
                          wave_chase="trials", outer_unroll=outer_unroll,
                          inner_unroll=inner_unroll)
    levels, jump, sweep_ops = run.operands
    x0s = jnp.asarray(x0s, dtype=levels.dtype)

    multiproc = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("batch"))
        rep = NamedSharding(mesh, P())
        ops_sh = jax.tree_util.tree_map(lambda _: rep, sweep_ops)
        mesh_key = (tuple(mesh.axis_names), tuple(mesh.shape.items()),
                    tuple(d.id for d in mesh.devices.flat))
        # On a mesh spanning processes (jax.distributed DCN cluster) the
        # batch-sharded outputs are not fully addressable here — return the
        # global on-device result; callers inspect .addressable_shards.
        multiproc = any(d.process_index != jax.process_index()
                        for d in mesh.devices.flat)
    else:
        sh = rep = ops_sh = mesh_key = None

    jits = run.jits
    if multiproc and outer_chunk:
        raise ValueError(
            "outer_chunk segmenting reads per-start stop flags back to the "
            "host, which requires fully-addressable shards — not available "
            "on a mesh spanning processes; use outer_chunk=None")
    if not outer_chunk:
        key = ("vsolve", mesh_key)
        if key not in jits:
            vm = jax.vmap(run.raw, in_axes=(0, None, None, None))
            if mesh is not None:
                vm = jax.jit(vm, in_shardings=(sh, rep, rep, ops_sh),
                             out_shardings=DeviceTRMResult(
                                 *([sh] * len(DeviceTRMResult._fields))))
            else:
                vm = jax.jit(vm)
            jits[key] = vm
        out = jits[key](x0s, levels, jump, sweep_ops)
        return out if multiproc else jax.device_get(out)

    init_f, outer_f, final_f = run.pieces
    key = ("vpieces", mesh_key)
    if key not in jits:
        vinit = jax.vmap(init_f, in_axes=(0, None, None, None))
        vouter = jax.vmap(outer_f, in_axes=(0, None, None, None, None))
        vfinal = jax.vmap(final_f)
        if mesh is not None:
            carry_sh = (sh,) * 12
            vinit = jax.jit(vinit, in_shardings=(sh, rep, rep, ops_sh),
                            out_shardings=carry_sh)
            vouter = jax.jit(vouter,
                             in_shardings=(carry_sh, rep, rep, rep, ops_sh),
                             out_shardings=carry_sh)
            vfinal = jax.jit(vfinal, in_shardings=(carry_sh,),
                             out_shardings=DeviceTRMResult(
                                 *([sh] * len(DeviceTRMResult._fields))))
        else:
            vinit, vouter, vfinal = map(jax.jit, (vinit, vouter, vfinal))
        jits[key] = (vinit, vouter, vfinal)
    vinit, vouter, vfinal = jits[key]
    c = vinit(x0s, levels, jump, sweep_ops)
    c = _segmented_loop(
        vouter, c, (levels, jump, sweep_ops), outer_chunk, run.maxiter,
        read_state=lambda c: (c[6], c[7]), progress=progress,
    )
    return jax.device_get(vfinal(c))
