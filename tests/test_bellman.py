"""DP-vs-brute-force: the strongest unit test of the Bellman kernel.

Enumerate every admissible path for tiny instances and check the DP returns a
path of exactly minimal cost within the L¹ trust-region budget (SURVEY.md §4
calls this out as absent from the reference).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mioc_tpu.ops import (
    backtrack,
    bounded_sum_levels,
    dp_solve,
    jump_cost_table,
    product_levels,
    stage_tables,
)

# With MIOC_TEST_TPU=1 on a real chip (conftest leaves the platform as
# configured) the Pallas tests run the COMPILED kernels; everywhere else they
# run in interpret mode.  Cost comparisons key on the active dtype (TPU has
# no float64; MIOC_TEST_F32=1 predicts that on CPU) — paths stay exact.
from _precision import F64

ON_TPU = jax.devices()[0].platform == "tpu"
INTERPRET = not ON_TPU
COST_RTOL = 1e-12 if F64 else 1e-5


def brute_force(stage, btilde, jump, B):
    """Min path cost over all level sequences with total budget ≤ B."""
    nt, L = stage.shape
    best = np.inf
    best_path = None
    for path in itertools.product(range(L), repeat=nt):
        b = sum(btilde[i, path[i]] for i in range(nt))
        if b > B:
            continue
        c = sum(stage[i, path[i]] for i in range(nt))
        c += sum(jump[path[i], path[i + 1]] for i in range(nt - 1))
        if c < best - 1e-15:
            best = c
            best_path = path
    return best, best_path


def path_cost(stage, btilde, jump, idx):
    nt = stage.shape[0]
    c = sum(stage[i, idx[i]] for i in range(nt))
    c += sum(jump[idx[i], idx[i + 1]] for i in range(nt - 1))
    b = sum(btilde[i, idx[i]] for i in range(nt))
    return c, b


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("p", [1, 2, np.inf])
def test_dp_matches_brute_force_sos1(seed, p):
    rng = np.random.default_rng(seed)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, B, tau, beta = 6, 4, 0.1, 0.37
    grad = jnp.asarray(rng.normal(size=(nt, s.M)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    jump = jump_cost_table(s.levels, p=p, beta=beta)

    u, idx, tables = dp_solve(grad, u_old, s.levels, jnp.asarray(jump), tau, B)
    stage, btilde = stage_tables(grad, u_old, jnp.asarray(s.levels), tau)
    stage, btilde = np.asarray(stage), np.asarray(btilde)

    ref_cost, _ = brute_force(stage, btilde, jump, B)
    got_cost, got_budget = path_cost(stage, btilde, jump, np.asarray(idx))
    assert got_budget <= B
    np.testing.assert_allclose(got_cost, ref_cost, rtol=COST_RTOL)
    np.testing.assert_array_equal(np.asarray(u), s.levels[np.asarray(idx)])


@pytest.mark.parametrize("seed", [0, 5])
def test_dp_matches_brute_force_multilevel(seed):
    rng = np.random.default_rng(seed)
    s = product_levels([[-2, -1, 0, 1, 2]])
    nt, B, tau, beta = 5, 6, 0.05, 0.11
    grad = jnp.asarray(rng.normal(size=(nt, s.M)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    jump = jump_cost_table(s.levels, p=1, beta=beta)

    u, idx, _ = dp_solve(grad, u_old, s.levels, jnp.asarray(jump), tau, B)
    stage, btilde = stage_tables(grad, u_old, jnp.asarray(s.levels), tau)
    stage, btilde = np.asarray(stage), np.asarray(btilde)

    ref_cost, _ = brute_force(stage, btilde, jump, B)
    got_cost, got_budget = path_cost(stage, btilde, jump, np.asarray(idx))
    assert got_budget <= B
    np.testing.assert_allclose(got_cost, ref_cost, rtol=COST_RTOL)


def test_budget_halving_reuses_tables():
    """A smaller budget re-extracted from the SAME tables must equal a fresh
    DP built with that smaller budget (multi-trust.jl:108-110 reuse)."""
    rng = np.random.default_rng(7)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, B, tau = 8, 6, 0.1
    grad = jnp.asarray(rng.normal(size=(nt, s.M)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    jump = jnp.asarray(jump_cost_table(s.levels, p=2, beta=0.2))

    _, _, (U, phi0, btilde) = dp_solve(grad, u_old, s.levels, jump, tau, B)
    stage, _ = stage_tables(grad, u_old, jnp.asarray(s.levels), tau)

    for B_new in [4, 2, 1, 0]:
        u_halved, idx_halved = backtrack(U, phi0, btilde, s.levels, jnp.int32(B_new))
        ref_cost, _ = brute_force(
            np.asarray(stage), np.asarray(btilde), np.asarray(jump), B_new
        )
        got_cost, got_budget = path_cost(
            np.asarray(stage), np.asarray(btilde), np.asarray(jump), np.asarray(idx_halved)
        )
        assert got_budget <= B_new
        np.testing.assert_allclose(got_cost, ref_cost, rtol=COST_RTOL)


def test_zero_budget_returns_u_old():
    """B = 0 forces u = u_old exactly."""
    rng = np.random.default_rng(3)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, tau = 10, 0.1
    grad = jnp.asarray(rng.normal(size=(nt, s.M)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=0.5))
    u, _, _ = dp_solve(grad, u_old, s.levels, jump, tau, 0)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_old))


def test_vmapped_pallas_build_matches_scan():
    """jax.vmap of the fused DP build dispatches to the batched grid kernel
    (custom_vmap rule); interpret mode exercises it on CPU."""
    import jax

    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    rng = np.random.default_rng(0)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, B, tau = 16, 5, 0.1
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=0.3))
    from mioc_tpu.ops.bellman import build_tables, max_budget_use

    smax = max_budget_use(s.levels)
    stages, btildes = [], []
    for k in range(3):
        grad = jnp.asarray(rng.normal(size=(nt, 3)))
        u_old = jnp.asarray(s.levels[rng.integers(0, 3, size=nt)])
        st, bt = stage_tables(grad, u_old, levels, tau)
        stages.append(st)
        btildes.append(bt)
    stage_b, btilde_b = jnp.stack(stages), jnp.stack(btildes)

    Ub, phib = jax.vmap(
        lambda st, bt: build_tables_pallas(st, bt, jump, B, smax, interpret=INTERPRET)
    )(stage_b, btilde_b)
    for k in range(3):
        Ur, phir = build_tables(stages[k], btildes[k], jump, B, smax)
        np.testing.assert_allclose(
            np.asarray(phib)[k, :3, : B + 1], np.asarray(phir), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(Ub)[k, :, :3, : B + 1], np.asarray(Ur)
        )


def test_huge_budget_equals_unconstrained_viterbi():
    """With B ≥ nt·smax the trust region is inactive: the DP must equal the
    plain (budget-free) min-plus recursion."""
    rng = np.random.default_rng(11)
    s = product_levels([[-2, -1, 0, 1, 2]])
    nt, tau, beta = 12, 0.1, 0.25
    grad = jnp.asarray(rng.normal(size=(nt, 1)))
    u_old = jnp.asarray(s.levels[rng.integers(0, 5, size=nt)])
    jump = np.asarray(jump_cost_table(s.levels, p=1, beta=beta))
    stage, btilde = stage_tables(grad, u_old, jnp.asarray(s.levels), tau)
    stage_np = np.asarray(stage)

    # Unconstrained Viterbi (backward).
    phi = stage_np[-1].copy()
    for i in range(nt - 2, -1, -1):
        phi = stage_np[i] + (jump + phi[None, :]).min(axis=1)
    expected = phi.min()

    from mioc_tpu.ops.bellman import max_budget_use

    B = nt * max_budget_use(s.levels)
    u, idx, _ = dp_solve(grad, u_old, s.levels, jnp.asarray(jump), tau, B)
    got = sum(stage_np[i, idx[i]] for i in range(nt)) + sum(
        jump[idx[i], idx[i + 1]] for i in range(nt - 1)
    )
    np.testing.assert_allclose(got, expected, rtol=COST_RTOL)


try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    nt=st.integers(2, 7),
    B=st.integers(0, 8),
    p=st.sampled_from([1, 2, np.inf]),
    sos1=st.booleans(),
)
def test_dp_matches_brute_force_property(seed, nt, B, p, sos1):
    """Property-based variant of the DP-vs-brute-force check: random tiny
    instances across admissible-set types, budgets and norms."""
    rng = np.random.default_rng(seed)
    s = (
        bounded_sum_levels([[0, 1], [0, 1]], 1, 1)
        if sos1
        else product_levels([[-1, 0, 1]])
    )
    grad = jnp.asarray(rng.normal(size=(nt, s.M)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    jump = jump_cost_table(s.levels, p=p, beta=float(rng.uniform(0, 0.6)))
    tau = float(rng.uniform(0.01, 0.3))

    u, idx, _ = dp_solve(grad, u_old, s.levels, jnp.asarray(jump), tau, B)
    stage, btilde = stage_tables(grad, u_old, jnp.asarray(s.levels), tau)
    stage, btilde = np.asarray(stage), np.asarray(btilde)
    ref_cost, _ = brute_force(stage, btilde, jump, B)
    got_cost, got_budget = path_cost(stage, btilde, jump, np.asarray(idx))
    assert got_budget <= B
    np.testing.assert_allclose(got_cost, ref_cost, rtol=1e-10)


@pytest.mark.parametrize("nt", [129, 256, 300])
def test_pallas_backtrack_interpret_long_horizon(nt):
    """The backtrack kernel stages idx writes in 128-entry chunks; nt values
    crossing (129), landing exactly on (256), and straddling (300) flush
    boundaries must match the scan backtrack."""
    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    s = bounded_sum_levels([[0, 1]] * 3, 1, 1)
    rng = np.random.default_rng(5)
    B, tau = 17, 0.05
    grad = jnp.asarray(rng.normal(size=(nt, 3)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=0.05))
    smax = max_budget_use(s.levels)
    stage, btilde = stage_tables(grad, u_old, levels, tau)

    U_p, phi_p = build_tables_pallas(stage, btilde, jump, B, smax, interpret=INTERPRET)
    for Bn in [B, 3]:
        i_s = np.asarray(backtrack(U_p, phi_p, btilde, levels, jnp.int32(Bn))[1])
        i_k = np.asarray(
            backtrack_pallas(U_p, phi_p, btilde, levels, jnp.int32(Bn),
                             interpret=INTERPRET)[1]
        )
        np.testing.assert_array_equal(i_s, i_k)


def test_pallas_kernels_interpret_L36():
    """Kernel regression at the heat-scale level count (Lp padding = 40,
    unrolled 36-way contraction) in interpret mode, including the device-side
    backtrack for several budgets."""
    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    s = product_levels([[0, 1, 2, 3, 4, 5]] * 2)
    rng = np.random.default_rng(2)
    nt, B, tau = 20, 12, 0.1
    grad = jnp.asarray(rng.normal(size=(nt, 2)))
    u_old = jnp.asarray(s.levels[rng.integers(0, 36, size=nt)])
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=2, beta=1e-3))
    smax = max_budget_use(s.levels)
    stage, btilde = stage_tables(grad, u_old, levels, tau)

    U_s, phi_s = build_tables(stage, btilde, jump, B, smax)
    U_p, phi_p = build_tables_pallas(stage, btilde, jump, B, smax, interpret=INTERPRET)
    # The kernel computes in f32 (TPU layout); compare accordingly.
    np.testing.assert_allclose(
        np.asarray(phi_p)[:36, : B + 1], np.asarray(phi_s), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(U_p)[:, :36, : B + 1], np.asarray(U_s)
    )
    for Bn in [B, 5, 0]:
        i_s = np.asarray(backtrack(U_p, phi_p, btilde, levels, jnp.int32(Bn))[1])
        i_k = np.asarray(
            backtrack_pallas(U_p, phi_p, btilde, levels, jnp.int32(Bn),
                             interpret=INTERPRET)[1]
        )
        np.testing.assert_array_equal(i_s, i_k)


def test_vmapped_pallas_backtrack_batched_chase():
    """jax.vmap of the fused backtrack on tile-padded RAW tables dispatches
    the batched chase kernel (backtrack_pallas._rule); per-start traced
    budgets (the TRM's independent halving schedules) and the scalar
    broadcast case both bit-match the scan backtrack.  Interpret mode on
    CPU; compiled on TPU (MIOC_TEST_TPU=1)."""
    import jax

    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import backtrack, build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    rng = np.random.default_rng(5)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, B, tau, S = 200, 23, 0.1, 4
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=np.inf, beta=1e-3))
    smax = max_budget_use(s.levels)
    grads = jnp.asarray(rng.normal(size=(S, nt, 3)))
    u_olds = jnp.asarray(s.levels[rng.integers(0, s.L, size=(S, nt))])
    stage_b, btilde_b = jax.vmap(stage_tables, in_axes=(0, 0, None, None))(
        grads, u_olds, levels, tau)

    # Raw (unsliced, multiple-of-64 time axis) tables — the device-TRM layout.
    U_b, phi_b = jax.vmap(
        lambda st, bt: build_tables_pallas(st, bt, jump, B, smax,
                                           interpret=INTERPRET, raw_u=True)
    )(stage_b, btilde_b)
    assert U_b.shape[1] % 64 == 0 and U_b.shape[1] >= nt - 1

    U_r, phi_r = jax.vmap(
        lambda st, bt: build_tables(st, bt, jump, B, smax))(stage_b, btilde_b)

    for B_new in (jnp.asarray(rng.integers(1, B + 1, size=S), jnp.int32),
                  jnp.int32(B)):
        in_ax = 0 if getattr(B_new, "ndim", 0) else None
        _, i_k = jax.vmap(
            lambda U, ph, bt, Bn: backtrack_pallas(U, ph, bt, levels, Bn,
                                                   interpret=INTERPRET),
            in_axes=(0, 0, 0, in_ax))(U_b, phi_b, btilde_b, B_new)
        _, i_s = jax.vmap(
            lambda U, ph, bt, Bn: backtrack(U, ph, bt, levels, Bn),
            in_axes=(0, 0, 0, in_ax))(U_r, phi_r, btilde_b, B_new)
        np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_s))


def test_vmapped_pallas_backtrack_batched_chase_L36():
    """Batched chase at the heat-scale level count: the statically-unrolled
    row select runs 36 python-int-compare branches per step (L=36, Lp=40);
    raw tables + per-start budgets, vs the vmapped scan backtrack."""
    import jax

    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import backtrack, build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    s = product_levels([[0, 1, 2, 3, 4, 5]] * 2)
    rng = np.random.default_rng(9)
    nt, B, tau, S = 70, 12, 0.1, 3
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=2, beta=1e-3))
    smax = max_budget_use(s.levels)
    grads = jnp.asarray(rng.normal(size=(S, nt, 2)))
    u_olds = jnp.asarray(s.levels[rng.integers(0, 36, size=(S, nt))])
    stage_b, btilde_b = jax.vmap(stage_tables, in_axes=(0, 0, None, None))(
        grads, u_olds, levels, tau)

    U_b, phi_b = jax.vmap(
        lambda st, bt: build_tables_pallas(st, bt, jump, B, smax,
                                           interpret=INTERPRET, raw_u=True)
    )(stage_b, btilde_b)
    U_r, phi_r = jax.vmap(
        lambda st, bt: build_tables(st, bt, jump, B, smax))(stage_b, btilde_b)

    Bns = jnp.asarray([B, 5, 0], jnp.int32)
    _, i_k = jax.vmap(
        lambda U, ph, bt, Bn: backtrack_pallas(U, ph, bt, levels, Bn,
                                               interpret=INTERPRET)
    )(U_b, phi_b, btilde_b, Bns)
    _, i_s = jax.vmap(
        lambda U, ph, bt, Bn: backtrack(U, ph, bt, levels, Bn)
    )(U_r, phi_r, btilde_b, Bns)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_s))


@pytest.mark.parametrize("unroll", [1, 2, 4, 8])
def test_pallas_build_unroll_bitmatch(unroll):
    """Time-step unrolling in the fused build kernel (per-step loop-control
    amortization at small Lp — BASELINE_SELF.md roofline, round 3) is pure
    code motion: every unroll factor must reproduce the scan build's tables
    bit-for-bit, including remainder handling (nsteps % unroll != 0)."""
    from mioc_tpu.ops.bellman import build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import _build_tables_impl

    rng = np.random.default_rng(3)
    s = product_levels([[-2, -1, 0, 1, 2]])
    nt, B, tau = 131, 16, 0.05  # nsteps=130: remainders for unroll 4 and 8
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=1e-3))
    smax = max_budget_use(s.levels)
    grad = jnp.asarray(rng.normal(size=(nt, 1)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    stage, btilde = stage_tables(grad, u_old, levels, tau)

    Ur, phir = build_tables(stage, btilde, jump, B, smax)
    Up, phip = _build_tables_impl(stage, btilde, jump, B, min(smax, B),
                                  interpret=INTERPRET, unroll=unroll)
    # Φ to f32 tolerance (the kernel is f32; the scan reference may be f64);
    # the argmin table must match EXACTLY — unrolling is pure code motion.
    np.testing.assert_allclose(
        np.asarray(phip)[: s.L, : B + 1], np.asarray(phir), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(Up)[:, : s.L, : B + 1], np.asarray(Ur)
    )
    # And across unroll factors the kernel output is bit-identical to the
    # unroll=1 kernel (same dtype, same op order within each step).
    U1, phi1 = _build_tables_impl(stage, btilde, jump, B, min(smax, B),
                                  interpret=INTERPRET, unroll=1)
    np.testing.assert_array_equal(np.asarray(phip), np.asarray(phi1))
    np.testing.assert_array_equal(np.asarray(Up), np.asarray(U1))


def test_trial_wave_chase_matches_per_trial_backtrack():
    """The trial-wave chase kernel (one shared table set, Kt budget caps —
    the speculative TRM's inner wave) bit-matches the scan backtrack at every
    cap, both unbatched and under the multistart vmap (one kernel for all
    S·Kt pointer chases)."""
    import jax

    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas_trials
    from mioc_tpu.ops.bellman import backtrack, build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    rng = np.random.default_rng(11)
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    nt, B, tau, S = 150, 23, 0.1, 3
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=np.inf, beta=1e-3))
    smax = max_budget_use(s.levels)
    B_ks = jnp.asarray([23, 11, 5, 2, 1, 0], jnp.int32)  # halving schedule

    grad = jnp.asarray(rng.normal(size=(nt, 3)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    U_p, phi_p = build_tables_pallas(stage, btilde, jump, B, smax,
                                     interpret=INTERPRET, raw_u=True)
    U_r, phi_r = build_tables(stage, btilde, jump, B, smax)

    us, idx = backtrack_pallas_trials(U_p, phi_p, btilde, levels, B_ks,
                                      interpret=INTERPRET)
    assert idx.shape == (len(B_ks), nt)
    for t, Bn in enumerate(np.asarray(B_ks)):
        u_ref, i_ref = backtrack(U_r, phi_r, btilde, levels, jnp.int32(Bn))
        np.testing.assert_array_equal(np.asarray(idx[t]), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(us[t]), np.asarray(u_ref))

    # Multistart form: vmap over starts dispatches ONE trial-wave kernel.
    grads = jnp.asarray(rng.normal(size=(S, nt, 3)))
    u_olds = jnp.asarray(s.levels[rng.integers(0, s.L, size=(S, nt))])
    stage_b, btilde_b = jax.vmap(stage_tables, in_axes=(0, 0, None, None))(
        grads, u_olds, levels, tau)
    U_b, phi_b = jax.vmap(
        lambda st, bt: build_tables_pallas(st, bt, jump, B, smax,
                                           interpret=INTERPRET, raw_u=True)
    )(stage_b, btilde_b)
    U_rb, phi_rb = jax.vmap(
        lambda st, bt: build_tables(st, bt, jump, B, smax))(stage_b, btilde_b)

    us_b, idx_b = jax.vmap(
        lambda U, ph, bt: backtrack_pallas_trials(U, ph, bt, levels, B_ks,
                                                  interpret=INTERPRET)
    )(U_b, phi_b, btilde_b)
    assert idx_b.shape == (S, len(B_ks), nt)
    for si in range(S):
        for t, Bn in enumerate(np.asarray(B_ks)):
            _, i_ref = backtrack(U_rb[si], phi_rb[si], btilde_b[si], levels,
                                 jnp.int32(Bn))
            np.testing.assert_array_equal(np.asarray(idx_b[si, t]),
                                          np.asarray(i_ref))


def test_nested_vmap_backtrack_flattens_into_one_batch():
    """A vmap-of-vmap of the fused backtrack (trials inside starts) flattens
    into a single (S·K)-batched chase via the recursive custom_vmap rule —
    results match the doubly-vmapped scan backtrack exactly."""
    import jax

    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import backtrack, build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    rng = np.random.default_rng(13)
    s = product_levels([[-1, 0, 1]])
    nt, B, tau, S = 130, 17, 0.1, 3
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=1e-3))
    smax = max_budget_use(s.levels)
    B_ks = jnp.asarray([17, 8, 4, 0], jnp.int32)

    grads = jnp.asarray(rng.normal(size=(S, nt, 1)))
    u_olds = jnp.asarray(s.levels[rng.integers(0, s.L, size=(S, nt))])
    stage_b, btilde_b = jax.vmap(stage_tables, in_axes=(0, 0, None, None))(
        grads, u_olds, levels, tau)
    U_b, phi_b = jax.vmap(
        lambda st, bt: build_tables_pallas(st, bt, jump, B, smax,
                                           interpret=INTERPRET, raw_u=True)
    )(stage_b, btilde_b)
    U_rb, phi_rb = jax.vmap(
        lambda st, bt: build_tables(st, bt, jump, B, smax))(stage_b, btilde_b)

    inner_p = lambda U, ph, bt: jax.vmap(
        lambda Bn: backtrack_pallas(U, ph, bt, levels, Bn,
                                    interpret=INTERPRET)[1])(B_ks)
    inner_s = lambda U, ph, bt: jax.vmap(
        lambda Bn: backtrack(U, ph, bt, levels, Bn)[1])(B_ks)
    idx_p = jax.vmap(inner_p)(U_b, phi_b, btilde_b)
    idx_s = jax.vmap(inner_s)(U_rb, phi_rb, btilde_b)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_s))


def test_vec_chase_variant_bitmatch(monkeypatch):
    """The experimental lane-broadcast chase kernel (MIOC_CHASE=vec; a
    measured performance negative, kept for future Mosaic revisions) stays
    bit-identical to the scan backtrack."""
    import mioc_tpu.ops.backtrack_pallas as bp
    from mioc_tpu.ops.bellman import backtrack, build_tables, max_budget_use
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas

    monkeypatch.setattr(bp, "_CHASE_VEC", True)
    rng = np.random.default_rng(3)
    s = product_levels([[-2, -1, 0, 1, 2]])
    nt, B, tau = 200, 17, 0.1
    levels = jnp.asarray(s.levels)
    jump = jnp.asarray(jump_cost_table(s.levels, p=1, beta=1e-3))
    smax = max_budget_use(s.levels)
    grad = jnp.asarray(rng.normal(size=(nt, 1)))
    u_old = jnp.asarray(s.levels[rng.integers(0, s.L, size=nt)])
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    U_p, phi_p = build_tables_pallas(stage, btilde, jump, B, smax,
                                     interpret=INTERPRET)
    U_r, phi_r = build_tables(stage, btilde, jump, B, smax)
    for Bn in (B, 7, 0):
        _, i_v = bp._backtrack_impl(U_p, phi_p, btilde, levels,
                                    jnp.int32(Bn), interpret=INTERPRET)
        _, i_s = backtrack(U_r, phi_r, btilde, levels, jnp.int32(Bn))
        np.testing.assert_array_equal(np.asarray(i_v), np.asarray(i_s))


def test_levels_at_matches_gather():
    """The one-hot level lookup (the gather replacement on the chase output
    path — the gather fusion cost ~50 µs per ×32 chase on TPU) must equal
    ``levels[idx]`` exactly for integer level values, any index rank."""
    import jax.numpy as jnp

    from mioc_tpu.ops.backtrack_pallas import _levels_at

    rng = np.random.default_rng(11)
    levels = jnp.asarray(rng.integers(-5, 6, size=(7, 3)).astype(float))
    for shape in ((13,), (4, 9), (2, 3, 5)):
        idx = jnp.asarray(rng.integers(0, 7, size=shape), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(_levels_at(levels, idx)),
            np.asarray(levels)[np.asarray(idx)])
