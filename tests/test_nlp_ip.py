"""Interior-point NLP solver parity tests (the native Ipopt analogue).

Oracles are the same problems the reference routes through Ipopt
(tests/solvers/ipopt/ipopt_interface_test.cpp solves HS071;
sqp_test_autodiff.cpp carries the Rosenbrock/SimpleNLP optima), checked at
the reference assertion tolerance 1e-2 and the Ipopt default tol 1e-6.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.nlp import (
    NLP, NLPBounds, IPNLPSettings, nlp_ip_solve,
)
from polympc_tpu.utils import status as st


def rosenbrock_nlp():
    def cost(x, p):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
    return NLP(cost=cost, n=2)


def test_ip_rosenbrock_unconstrained():
    sol = nlp_ip_solve(rosenbrock_nlp(), jnp.array([-1.2, 1.0]))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-4)


def test_ip_rosenbrock_on_circle():
    base = rosenbrock_nlp()
    nlp = NLP(cost=base.cost, n=2,
              eq=lambda x, p: jnp.array([x @ x - 1.0]), ne=1)
    sol = nlp_ip_solve(nlp, jnp.array([0.5, 0.5]))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.7864, 0.6177], atol=1e-2)


def test_ip_simple_constrained_nlp():
    # min -x1-x2 s.t. 1 <= ||x||^2 <= 2, x >= 0 -> x* = (1, 1)
    nlp = NLP(cost=lambda x, p: -x[0] - x[1], n=2,
              ineq=lambda x, p: jnp.array([x @ x]), ni=1)
    bounds = NLPBounds(lbx=jnp.zeros(2), ubx=jnp.full(2, jnp.inf),
                       gl=jnp.array([1.0]), gu=jnp.array([2.0]))
    sol = nlp_ip_solve(nlp, jnp.array([1.2, 0.1]), bounds=bounds)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-2)


@pytest.mark.parametrize("hessian", ["exact"])
def test_ip_hs071(hessian):
    def cost(x, p):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]
    nlp = NLP(cost=cost, n=4,
              eq=lambda x, p: jnp.array([x @ x - 40.0]), ne=1,
              ineq=lambda x, p: jnp.array([x[0] * x[1] * x[2] * x[3]]), ni=1)
    bounds = NLPBounds(lbx=jnp.full(4, 1.0), ubx=jnp.full(4, 5.0),
                       gl=jnp.array([25.0]), gu=jnp.array([jnp.inf]))
    sol = nlp_ip_solve(nlp, jnp.array([1.0, 5.0, 5.0, 1.0]), bounds=bounds,
                       settings=IPNLPSettings(hessian=hessian))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x),
                               [1.0, 4.743, 3.821, 1.379], atol=1e-2)
    assert float(sol.violation) < 1e-6


def test_ip_equality_qp_high_accuracy():
    # the canonical reference QP (admm_solver_test.cpp:19-45) posed as an
    # NLP: the IP path must hit it to Ipopt-default accuracy, not just 1e-2
    H = jnp.array([[4.0, 1.0], [1.0, 2.0]])
    h = jnp.array([1.0, 1.0])
    nlp = NLP(cost=lambda x, p: 0.5 * x @ H @ x + h @ x, n=2,
              eq=lambda x, p: jnp.array([x[0] + x[1] - 1.0]), ne=1)
    bounds = NLPBounds(lbx=jnp.zeros(2), ubx=jnp.full(2, 0.7),
                       gl=jnp.zeros(0), gu=jnp.zeros(0))
    sol = nlp_ip_solve(nlp, jnp.array([0.5, 0.5]), bounds=bounds)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-5)


def test_ip_vmap_batch():
    nlp = NLP(cost=lambda x, p: jnp.sum((x - p) ** 2), n=2,
              eq=lambda x, p: jnp.array([x[0] + x[1] - 1.0]), ne=1)
    B = 6
    x0s = jnp.asarray(np.random.default_rng(1).normal(size=(B, 2)))
    ps = jnp.asarray(np.linspace(-1, 1, B)[:, None] * np.ones((B, 2)))
    sols = jax.vmap(lambda x0, p: nlp_ip_solve(nlp, x0, p=p))(x0s, ps)
    assert np.all(np.asarray(sols.status) == st.SOLVED)
    for i in range(B):
        a = float(ps[i, 0])
        expect = a + (1 - 2 * a) / 2
        np.testing.assert_allclose(np.asarray(sols.x[i]),
                                   [expect, expect], atol=1e-4)


def test_ip_warm_start_duals():
    # re-solve from the optimum with warm duals: few iterations
    nlp = NLP(cost=lambda x, p: (x[0] - 2.0) ** 2 + (x[1] + 1.0) ** 2, n=2,
              eq=lambda x, p: jnp.array([x[0] - x[1] - 4.0]), ne=1)
    s1 = nlp_ip_solve(nlp, jnp.zeros(2))
    assert int(s1.status) == st.SOLVED
    s2 = nlp_ip_solve(nlp, s1.x, lam0=s1.lam)
    assert int(s2.status) == st.SOLVED
    assert int(s2.iters) <= int(s1.iters)


def test_mpc_with_ip_backend():
    # the MPC facade with solver="ip" (the reference's Ipopt-backed route,
    # ipopt_ocp_test.cpp) must agree with the SQP backend on the robot OCP
    from polympc_tpu.basis import Chebyshev, SegmentedBasis
    from polympc_tpu.control import MPC
    from tests.test_control import robot_ocp

    def build(solver, **kw):
        m = MPC(robot_ocp(), SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=2.0,
                solver=solver, **kw)
        m.set_static_parameters([2.0])
        m.control_bounds([-1.5, -0.75], [1.5, 0.75])
        m.initial_conditions([0.5, 0.5, 0.5])
        m.x_guess([0.5, 0.5, 0.5])
        return m

    ip = build("ip")
    sol_ip = ip.solve()
    assert int(sol_ip.status) == st.SOLVED
    sqp = build("sqp")
    sol_sqp = sqp.solve()
    assert int(sol_sqp.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(ip.solution_x()),
                               np.asarray(sqp.solution_x()), atol=1e-3)
    # warm-started re-solve must also converge
    ip.initial_conditions([0.51, 0.49, 0.5])
    warm = ip.solve()
    assert int(warm.status) == st.SOLVED
