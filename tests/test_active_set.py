"""Native dense active-set QP solver (QPMAD analogue) tests.

Oracles: the canonical reference QP (admm_solver_test.cpp:19-45), exact KKT
residuals, and cross-validation against the boxADMM solver (the "two
independent implementations" consistency pattern of SURVEY.md §4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from polympc_tpu.qp.active_set import qp_active_set_solve
from polympc_tpu.qp.box_admm import box_admm_solve
from polympc_tpu.qp.types import ADMMSettings, QPData
from polympc_tpu.utils import status as st

INF = np.inf


def _kkt_residuals(qp, sol):
    x = np.asarray(sol.x)
    stat = np.asarray(qp.H @ sol.x + qp.h + qp.A.T @ sol.y + sol.y_box)
    Ax = np.asarray(qp.A) @ x
    prim = np.maximum(Ax - np.asarray(qp.au), 0) \
        + np.maximum(np.asarray(qp.al) - Ax, 0)
    box = np.maximum(x - np.asarray(qp.xu), 0) \
        + np.maximum(np.asarray(qp.xl) - x, 0)
    return np.max(np.abs(stat)), max(prim.max(initial=0), box.max(initial=0))


def test_canonical_qp():
    qp = QPData(H=jnp.array([[4.0, 1.0], [1.0, 2.0]]),
                h=jnp.array([1.0, 1.0]),
                A=jnp.array([[1.0, 1.0]]),
                al=jnp.array([1.0]), au=jnp.array([1.0]),
                xl=jnp.array([0.0, 0.0]), xu=jnp.array([0.7, 0.7]))
    sol = qp_active_set_solve(qp)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.3, 0.7], atol=1e-10)
    stat, prim = _kkt_residuals(qp, sol)
    assert stat < 1e-12 and prim < 1e-12


def test_unconstrained_minimum_inside_box():
    H = jnp.eye(3) * 2.0
    h = jnp.array([-2.0, 0.0, 2.0])
    qp = QPData(H=H, h=h, A=jnp.zeros((0, 3)),
                al=jnp.zeros(0), au=jnp.zeros(0),
                xl=jnp.full(3, -5.0), xu=jnp.full(3, 5.0))
    sol = qp_active_set_solve(qp)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 0.0, -1.0],
                               atol=1e-12)
    assert np.all(np.asarray(sol.y_box) == 0.0)


def test_infeasible_detected():
    # x >= 1 and x <= -1 simultaneously
    qp = QPData(H=jnp.eye(1), h=jnp.zeros(1),
                A=jnp.array([[1.0]]), al=jnp.array([1.0]),
                au=jnp.array([INF]),
                xl=jnp.array([-INF]), xu=jnp.array([-1.0]))
    sol = qp_active_set_solve(qp)
    assert int(sol.status) == st.INFEASIBLE


def test_not_positive_definite_flagged():
    qp = QPData(H=jnp.array([[0.0, 0.0], [0.0, 1.0]]), h=jnp.ones(2),
                A=jnp.zeros((0, 2)), al=jnp.zeros(0), au=jnp.zeros(0),
                xl=jnp.full(2, -1.0), xu=jnp.full(2, 1.0))
    sol = qp_active_set_solve(qp)
    assert int(sol.status) == st.UNSOLVED


@pytest.mark.parametrize("trial", range(8))
def test_random_qp_matches_admm(trial):
    rng = np.random.default_rng(trial)
    n, m = 10, 6
    Q = rng.normal(size=(n, n))
    H = Q @ Q.T + n * np.eye(n)
    h = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    al = rng.uniform(-2, -0.5, m)
    au = rng.uniform(0.5, 2, m)
    if trial % 3 == 0:
        au[:2] = al[:2]  # equality rows
    xl = rng.uniform(-3, -1, n)
    xu = rng.uniform(1, 3, n)
    if trial % 4 == 0:
        xl[0], xu[1] = -INF, INF  # loose bounds
    qp = QPData(*[jnp.asarray(v) for v in (H, h, A, al, au, xl, xu)])
    s1 = qp_active_set_solve(qp)
    assert int(s1.status) == st.SOLVED
    stat, prim = _kkt_residuals(qp, s1)
    assert stat < 1e-8 and prim < 1e-8
    s2 = box_admm_solve(qp, settings=ADMMSettings(
        eps_abs=1e-10, eps_rel=1e-10, max_epochs=80, equil_iters=4))
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-5)
