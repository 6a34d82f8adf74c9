"""Trust-region Newton + projected-gradient solvers (nlp/tr.py) vs the
reference's experimental-solver oracles
(src/solvers/trust_region_tests/{trust_region_test,gradproj_test}.cpp).
"""
import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.nlp import trust_region_solve, projected_gradient_solve
from polympc_tpu.utils import status as st

# the reference's SimpleQP (trust_region_test.cpp:80-86 / gradproj_test.cpp):
# H = diag(10, 0.1), h = (-1, -2); unconstrained min = (0.1, 20),
# box [-1,1]^2 min = (0.1, 1)
H = jnp.asarray([[10.0, 0.0], [0.0, 0.1]])
h = jnp.asarray([-1.0, -2.0])
qp_f = lambda x: 0.5 * x @ (H @ x) + h @ x


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def test_tr_simple_qp():
    sol = trust_region_solve(qp_f, jnp.zeros(2))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.1, 20.0], atol=1e-4)


def test_tr_rosenbrock():
    sol = trust_region_solve(rosenbrock, jnp.zeros(2), max_iter=200)
    assert int(sol.status) == st.SOLVED, float(sol.grad_norm)
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-4)


def test_tr_vmap_batch():
    x0s = jnp.asarray([[0.0, 0.0], [-1.0, 1.5], [2.0, 2.0]])
    sols = jax.jit(jax.vmap(
        lambda x0: trust_region_solve(rosenbrock, x0, max_iter=200)))(x0s)
    assert (np.asarray(sols.status) == st.SOLVED).all()
    np.testing.assert_allclose(np.asarray(sols.x),
                               np.ones((3, 2)), atol=1e-4)


def test_gradproj_box_qp():
    # gradproj oracle: box-clipped minimiser (0.1, 1.0)
    sol = projected_gradient_solve(qp_f, jnp.zeros(2),
                                   lb=[-1.0, -1.0], ub=[1.0, 1.0],
                                   max_iter=500)
    assert int(sol.status) == st.SOLVED, float(sol.grad_norm)
    np.testing.assert_allclose(np.asarray(sol.x), [0.1, 1.0], atol=1e-5)


def test_gradproj_active_bound_stationarity():
    # start outside the box; the projected-gradient residual must certify
    # stationarity with the upper bound active
    sol = projected_gradient_solve(qp_f, jnp.asarray([5.0, -5.0]),
                                   lb=[-1.0, -1.0], ub=[1.0, 1.0],
                                   max_iter=500)
    assert int(sol.status) == st.SOLVED
    assert float(sol.grad_norm) <= 1e-6


def test_tr_max_iter_status():
    sol = trust_region_solve(rosenbrock, jnp.asarray([-1.9, 2.0]),
                             max_iter=3)
    assert int(sol.status) == st.MAX_ITER_EXCEEDED
