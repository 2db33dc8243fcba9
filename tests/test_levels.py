import numpy as np

from mioc_tpu.ops import bounded_sum_levels, jump_cost_table, product_levels


def test_product_enumeration_order_and_count():
    V = [[-2, -1, 0, 1, 2]]
    s = product_levels(V)
    assert s.L == 5 and s.M == 1
    np.testing.assert_array_equal(s.levels[:, 0], [-2, -1, 0, 1, 2])

    V2 = [[0, 1], [0, 1, 2]]
    s2 = product_levels(V2)
    assert s2.L == 6
    # Julia Iterators.product order: first control varies fastest.
    np.testing.assert_array_equal(
        s2.levels, [[0, 0], [1, 0], [0, 1], [1, 1], [0, 2], [1, 2]]
    )


def test_heat_product_count():
    s = product_levels([[0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5]])
    assert s.L == 36


def test_bounded_sum_sos1():
    # Exactly one active control (example_fishing.jl:24).
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    assert s.L == 3
    np.testing.assert_array_equal(s.levels, [[1, 0, 0], [0, 1, 0], [0, 0, 1]])


def test_jump_cost_p1_p2_pinf():
    s = bounded_sum_levels([[0, 1], [0, 1], [0, 1]], 1, 1)
    c1 = jump_cost_table(s.levels, p=1, beta=2.0)
    assert c1[0, 0] == 0.0 and c1[0, 1] == 4.0  # ‖(1,0,0)-(0,1,0)‖₁ = 2
    c2 = jump_cost_table(s.levels, p=2)
    np.testing.assert_allclose(c2[0, 1], np.sqrt(2.0))
    cinf = jump_cost_table(s.levels, p=np.inf)
    assert cinf[0, 0] == 0.0 and cinf[0, 1] == 1.0
    # Reference p=inf quirk: uniform cost for every transition.
    cq = jump_cost_table(s.levels, p=np.inf, beta=0.5, compat_pinf=True)
    np.testing.assert_array_equal(cq, 0.5 * np.ones((3, 3)))


def test_tv_p_docstring_values():
    """TV_p docstring examples, HelpFunctions.jl:236-249 (columns = time there;
    our arrays are time-major so the matrix is transposed)."""
    import jax.numpy as jnp

    from mioc_tpu.ops import tv_p

    u = jnp.array([[1, -1, 1], [3, 3, 0], [2, 2, 1]]).T.astype(float)
    assert float(tv_p(u, 1)) == 8.0
    np.testing.assert_allclose(float(tv_p(u, 2)), 5.741657386773941)
    assert float(tv_p(u, np.inf)) == 5.0
    assert float(tv_p(None, 1)) == 0.0
