"""QP solver parity tests.

Oracle from the reference's QP tests (tests/solvers/qp/admm_solver_test.cpp,
box_admm_test.cpp, qp_solver_sparse_test.cpp): the canonical 2-variable QP
    H=[[4,1],[1,2]], h=(1,1), x1+x2=1, x in [0,0.7]^2  ->  x* = (0.3, 0.7)
plus randomized QPs cross-checked against an interior-point-quality reference
(cvx-style KKT solve via active set enumeration is overkill; we use scipy-free
verification through KKT residuals and a projected-gradient check).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.qp import (
    QPData, ADMMSettings, box_admm_solve, admm_solve, ruiz_equilibrate,
    unscale_solution,
)
from polympc_tpu.utils import status as st


def simple_qp():
    inf = jnp.inf
    return QPData(
        H=jnp.array([[4.0, 1.0], [1.0, 2.0]]),
        h=jnp.array([1.0, 1.0]),
        A=jnp.array([[1.0, 1.0]]),
        al=jnp.array([1.0]),
        au=jnp.array([1.0]),
        xl=jnp.array([0.0, 0.0]),
        xu=jnp.array([0.7, 0.7]),
    )


def test_box_admm_simple():
    sol = box_admm_solve(simple_qp())
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-2)
    assert int(sol.iters) < ADMMSettings().max_iter


def test_box_admm_tight():
    s = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40)
    sol = box_admm_solve(simple_qp(), settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-5)


def test_admm_stacked_variant():
    sol = admm_solve(simple_qp())
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-2)


def test_warm_start_helps():
    qp = simple_qp()
    cold = box_admm_solve(qp)
    warm = box_admm_solve(qp, x0=cold.x, y0=cold.y)
    assert int(warm.status) == st.SOLVED
    assert int(warm.iters) <= int(cold.iters)


def test_unconstrained():
    # no general constraints (m=0): solution of H x = -h within box
    qp = QPData(
        H=jnp.array([[2.0, 0.0], [0.0, 2.0]]),
        h=jnp.array([-2.0, -4.0]),
        A=jnp.zeros((0, 2)),
        al=jnp.zeros((0,)), au=jnp.zeros((0,)),
        xl=jnp.array([-10.0, -10.0]), xu=jnp.array([10.0, 10.0]),
    )
    sol = box_admm_solve(qp)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-3)


def test_max_iter_exceeded_status():
    s = ADMMSettings(max_epochs=1, check_every=1, eps_abs=1e-12, eps_rel=0.0)
    sol = box_admm_solve(simple_qp(), settings=s)
    assert int(sol.status) == st.MAX_ITER_EXCEEDED


def _kkt_check(qp, sol, tol=1e-4):
    """Verify KKT conditions of a box QP solution directly."""
    x, y, yb = np.asarray(sol.x), np.asarray(sol.y), np.asarray(sol.y_box)
    H, h, A = np.asarray(qp.H), np.asarray(qp.h), np.asarray(qp.A)
    # stationarity
    grad = H @ x + h + (A.T @ y if A.size else 0) + yb
    np.testing.assert_allclose(grad, 0.0, atol=tol)
    # primal feasibility
    if A.size:
        Ax = A @ x
        assert np.all(Ax >= np.asarray(qp.al) - tol)
        assert np.all(Ax <= np.asarray(qp.au) + tol)
    assert np.all(x >= np.asarray(qp.xl) - tol)
    assert np.all(x <= np.asarray(qp.xu) + tol)


def test_random_qps_kkt():
    rng = np.random.default_rng(0)
    s = ADMMSettings(eps_abs=1e-7, eps_rel=1e-7, max_epochs=60)
    for trial in range(5):
        n, m = 8, 5
        M = rng.normal(size=(n, n))
        H = jnp.asarray(M @ M.T + 0.5 * np.eye(n))
        h = jnp.asarray(rng.normal(size=n))
        A = jnp.asarray(rng.normal(size=(m, n)))
        x_feas = rng.normal(size=n) * 0.5
        Ax = np.asarray(A) @ x_feas
        al = jnp.asarray(Ax - rng.uniform(0.1, 1.0, m))
        au = jnp.asarray(Ax + rng.uniform(0.1, 1.0, m))
        xl = jnp.asarray(x_feas - rng.uniform(0.1, 2.0, n))
        xu = jnp.asarray(x_feas + rng.uniform(0.1, 2.0, n))
        qp = QPData(H, h, A, al, au, xl, xu)
        sol = box_admm_solve(qp, settings=s)
        assert int(sol.status) == st.SOLVED, f"trial {trial}"
        _kkt_check(qp, sol, tol=1e-4)


def test_equality_only_matches_linear_solve():
    # equality-constrained QP has closed form via KKT
    rng = np.random.default_rng(1)
    n, m = 6, 3
    M = rng.normal(size=(n, n))
    H = M @ M.T + np.eye(n)
    h = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    K = np.block([[H, A.T], [A, np.zeros((m, m))]])
    xy = np.linalg.solve(K, np.concatenate([-h, b]))
    inf = jnp.inf
    qp = QPData(jnp.asarray(H), jnp.asarray(h), jnp.asarray(A),
                jnp.asarray(b), jnp.asarray(b),
                jnp.full(n, -inf), jnp.full(n, inf))
    s = ADMMSettings(eps_abs=1e-8, eps_rel=1e-8, max_epochs=80)
    sol = box_admm_solve(qp, settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), xy[:n], atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.y), xy[n:], atol=1e-3)


def test_ruiz_equilibration_roundtrip():
    # badly scaled QP: equilibrated solve must match direct solve
    qp0 = simple_qp()
    scale = jnp.array([1e3, 1e-2])
    qp = QPData(
        H=qp0.H * scale[:, None] * scale[None, :],
        h=qp0.h * scale,
        A=qp0.A * scale[None, :],
        al=qp0.al, au=qp0.au,
        xl=qp0.xl / scale, xu=qp0.xu / scale,
    )
    sqp, s = ruiz_equilibrate(qp, iters=4)
    # equilibrated matrix is well-conditioned
    norms = np.max(np.abs(np.asarray(sqp.H)), axis=0)
    assert norms.max() / norms.min() < 100.0
    sol_scaled = box_admm_solve(
        sqp, settings=ADMMSettings(eps_abs=1e-8, eps_rel=1e-8, max_epochs=60))
    x, y, yb = unscale_solution(sol_scaled.x, sol_scaled.y, sol_scaled.y_box, s)
    np.testing.assert_allclose(np.asarray(x * scale), [0.3, 0.7], atol=1e-3)


def test_builtin_equilibration():
    sol = box_admm_solve(
        simple_qp(),
        settings=ADMMSettings(equil_iters=4, eps_abs=1e-6, eps_rel=1e-6,
                              max_epochs=40))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-4)


def test_vmap_batch():
    # batch of QPs differing in h: all must solve, statuses per-instance
    qp = simple_qp()
    B = 16
    hs = jnp.stack([qp.h + 0.1 * i for i in range(B)])
    batched = QPData(
        H=jnp.broadcast_to(qp.H, (B, 2, 2)), h=hs,
        A=jnp.broadcast_to(qp.A, (B, 1, 2)),
        al=jnp.broadcast_to(qp.al, (B, 1)), au=jnp.broadcast_to(qp.au, (B, 1)),
        xl=jnp.broadcast_to(qp.xl, (B, 2)), xu=jnp.broadcast_to(qp.xu, (B, 2)),
    )
    sols = jax.vmap(lambda q: box_admm_solve(q))(batched)
    assert np.all(np.asarray(sols.status) == st.SOLVED)
    # instance 0 is the canonical QP
    np.testing.assert_allclose(np.asarray(sols.x[0]), [0.3, 0.7], atol=1e-2)


def test_grad_through_solve():
    # differentiability: d(x*)/d(h) by implicit function vs finite differences
    qp = simple_qp()
    s = ADMMSettings(eps_abs=1e-9, eps_rel=1e-9, max_epochs=100)

    def solve_x0(h1):
        q = qp._replace(h=qp.h.at[0].set(h1),
                        xu=jnp.array([10.0, 10.0]))  # inactive box
        return box_admm_solve(q, settings=s).x[0]

    g = jax.grad(solve_x0)(1.0)
    eps = 1e-4
    fd = (solve_x0(1.0 + eps) - solve_x0(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g, fd, atol=1e-3)


# ---------- interior-point solver ----------

def test_ip_simple_qp():
    from polympc_tpu.qp.ip import qp_ip_solve, IPSettings
    sol = qp_ip_solve(simple_qp())
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-6)
    assert float(sol.res_prim) < 1e-7 and float(sol.res_dual) < 1e-7


def test_ip_matches_admm_duals():
    from polympc_tpu.qp.ip import qp_ip_solve
    qp = simple_qp()
    ip = qp_ip_solve(qp)
    ad = box_admm_solve(qp, settings=ADMMSettings(eps_abs=1e-8, eps_rel=1e-8,
                                                  max_epochs=60))
    np.testing.assert_allclose(np.asarray(ip.x), np.asarray(ad.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ip.y), np.asarray(ad.y), atol=1e-4)


def test_ip_random_qps():
    from polympc_tpu.qp.ip import qp_ip_solve
    rng = np.random.default_rng(3)
    for trial in range(5):
        n, m = 10, 6
        M = rng.normal(size=(n, n))
        H = jnp.asarray(M @ M.T + 0.5 * np.eye(n))
        h = jnp.asarray(rng.normal(size=n))
        A = jnp.asarray(rng.normal(size=(m, n)))
        x_feas = rng.normal(size=n) * 0.5
        Ax = np.asarray(A) @ x_feas
        qp = QPData(H, h, A,
                    jnp.asarray(Ax - rng.uniform(0.1, 1.0, m)),
                    jnp.asarray(Ax + rng.uniform(0.1, 1.0, m)),
                    jnp.asarray(x_feas - rng.uniform(0.1, 2.0, n)),
                    jnp.asarray(x_feas + rng.uniform(0.1, 2.0, n)))
        sol = qp_ip_solve(qp)
        assert int(sol.status) == st.SOLVED, f"trial {trial}"
        _kkt_check(qp, sol, tol=1e-6)


def test_ip_unbounded_directions_handled():
    from polympc_tpu.qp.ip import qp_ip_solve
    inf = jnp.inf
    qp = QPData(H=jnp.array([[2.0, 0.0], [0.0, 2.0]]),
                h=jnp.array([-2.0, -4.0]),
                A=jnp.zeros((0, 2)), al=jnp.zeros(0), au=jnp.zeros(0),
                xl=jnp.array([-inf, -inf]), xu=jnp.array([inf, inf]))
    sol = qp_ip_solve(qp)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 2.0], atol=1e-7)


def test_ip_vmap():
    from polympc_tpu.qp.ip import qp_ip_solve
    qp = simple_qp()
    B = 8
    hs = jnp.stack([qp.h * (1 + 0.1 * i) for i in range(B)])
    batched = QPData(
        H=jnp.broadcast_to(qp.H, (B, 2, 2)), h=hs,
        A=jnp.broadcast_to(qp.A, (B, 1, 2)),
        al=jnp.broadcast_to(qp.al, (B, 1)), au=jnp.broadcast_to(qp.au, (B, 1)),
        xl=jnp.broadcast_to(qp.xl, (B, 2)), xu=jnp.broadcast_to(qp.xu, (B, 2)))
    sols = jax.vmap(lambda q: qp_ip_solve(q))(batched)
    assert np.all(np.asarray(sols.status) == st.SOLVED)


# ---- infeasibility certificates (OSQP §3.4; ref status surface
# qp_base.hpp:55-62 + osqp_interface.hpp:92-101) ----

def test_primal_infeasible_certificate():
    # x in [1, 2] (box) but A x = x <= 0 (row): no feasible point
    inf = jnp.inf
    qp = QPData(H=jnp.eye(1), h=jnp.zeros(1),
                A=jnp.eye(1), al=jnp.array([-inf]), au=jnp.array([0.0]),
                xl=jnp.array([1.0]), xu=jnp.array([2.0]))
    sol = box_admm_solve(qp, settings=ADMMSettings(max_epochs=40,
                                                   polish=False))
    assert int(sol.status) == st.INFEASIBLE


def test_primal_infeasible_certificate_2d():
    # contradictory rows: x0 + x1 >= 3 and x0 + x1 <= 1
    inf = jnp.inf
    qp = QPData(H=jnp.eye(2), h=jnp.zeros(2),
                A=jnp.array([[1.0, 1.0], [1.0, 1.0]]),
                al=jnp.array([3.0, -inf]), au=jnp.array([inf, 1.0]),
                xl=jnp.full(2, -inf), xu=jnp.full(2, inf))
    sol = box_admm_solve(qp, settings=ADMMSettings(max_epochs=40,
                                                   polish=False))
    assert int(sol.status) == st.INFEASIBLE


def test_dual_infeasible_certificate():
    # min -x, x free: unbounded below -> dual infeasible (INCONSISTENT)
    inf = jnp.inf
    qp = QPData(H=jnp.zeros((1, 1)), h=jnp.array([-1.0]),
                A=jnp.zeros((0, 1)), al=jnp.zeros(0), au=jnp.zeros(0),
                xl=jnp.array([-inf]), xu=jnp.array([inf]))
    sol = box_admm_solve(qp, settings=ADMMSettings(max_epochs=40,
                                                   polish=False))
    assert int(sol.status) == st.INCONSISTENT


def test_feasible_qp_not_flagged_infeasible():
    # the simple oracle QP must still report SOLVED with certificates on
    sol = box_admm_solve(simple_qp(), settings=ADMMSettings(max_epochs=40))
    assert int(sol.status) == st.SOLVED


def test_infeasibility_under_vmap():
    inf = jnp.inf
    # lane 0 feasible, lane 1 infeasible (box [1,2] vs row x <= 0 / x <= 5)
    qp = QPData(H=jnp.broadcast_to(jnp.eye(1), (2, 1, 1)),
                h=jnp.zeros((2, 1)),
                A=jnp.broadcast_to(jnp.eye(1), (2, 1, 1)),
                al=jnp.array([[-inf], [-inf]]), au=jnp.array([[5.0], [0.0]]),
                xl=jnp.ones((2, 1)), xu=jnp.full((2, 1), 2.0))
    s = ADMMSettings(max_epochs=40, polish=False)
    sols = jax.vmap(lambda q: box_admm_solve(q, settings=s))(qp)
    assert int(sols.status[0]) == st.SOLVED
    assert int(sols.status[1]) == st.INFEASIBLE
