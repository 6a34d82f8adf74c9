"""SQP solver parity tests.

Oracles from the reference's SQP suite (tests/solvers/sqp/sqp_test_autodiff.cpp):
unconstrained & circle-constrained Rosenbrock, a simple 2-var NLP, and HS071,
checked against known optima at 1e-2 (the reference's assertion tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.nlp import NLP, NLPBounds, SQPSettings, sqp_solve, unbounded
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

TIGHT_QP = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40)


def rosenbrock_nlp():
    a, b = 1.0, 100.0
    def cost(x, p):
        return (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2
    return NLP(cost=cost, n=2)


@pytest.mark.parametrize("hessian", ["bfgs", "sr1", "exact"])
def test_rosenbrock_unconstrained(hessian):
    nlp = rosenbrock_nlp()
    s = SQPSettings(hessian=hessian, max_iter=150, qp=TIGHT_QP,
                    eps_prim=1e-6, eps_dual=1e-6)
    sol = sqp_solve(nlp, jnp.array([-1.2, 1.0]), settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-2)


def test_rosenbrock_on_circle():
    # min rosenbrock s.t. x'x = 1 -> x* = (0.7864, 0.6177)
    base = rosenbrock_nlp()
    nlp = NLP(cost=base.cost, n=2,
              eq=lambda x, p: jnp.array([x @ x - 1.0]), ne=1)
    s = SQPSettings(hessian="exact", max_iter=100, qp=TIGHT_QP)
    sol = sqp_solve(nlp, jnp.array([0.5, 0.5]), settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [0.7864, 0.6177], atol=1e-2)


def test_simple_constrained_nlp():
    # sqp_test_autodiff.cpp SimpleNLP: min -x1 -x2
    # s.t. 1 <= x1^2 + x2^2 <= 2, x >= 0  ->  x* = (1, 1)
    nlp = NLP(cost=lambda x, p: -x[0] - x[1], n=2,
              ineq=lambda x, p: jnp.array([x @ x]), ni=1)
    bounds = NLPBounds(lbx=jnp.array([0.0, 0.0]), ubx=jnp.array([jnp.inf] * 2),
                       gl=jnp.array([1.0]), gu=jnp.array([2.0]))
    s = SQPSettings(hessian="bfgs", max_iter=100, qp=TIGHT_QP)
    sol = sqp_solve(nlp, jnp.array([1.2, 0.1]), bounds=bounds, settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, 1.0], atol=1e-2)


@pytest.mark.parametrize("hessian", ["bfgs", "sr1", "exact"])
def test_hs071(hessian):
    # min x1*x4*(x1+x2+x3) + x3
    # s.t. x1*x2*x3*x4 >= 25; x1^2+..+x4^2 = 40; 1 <= x <= 5
    # x* = (1.0, 4.743, 3.821, 1.379)
    def cost(x, p):
        return x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2]
    nlp = NLP(cost=cost, n=4,
              eq=lambda x, p: jnp.array([x @ x - 40.0]), ne=1,
              ineq=lambda x, p: jnp.array([x[0] * x[1] * x[2] * x[3]]), ni=1)
    bounds = NLPBounds(lbx=jnp.full(4, 1.0), ubx=jnp.full(4, 5.0),
                       gl=jnp.array([25.0]), gu=jnp.array([jnp.inf]))
    s = SQPSettings(hessian=hessian, max_iter=150, qp=TIGHT_QP)
    sol = sqp_solve(nlp, jnp.array([1.0, 5.0, 5.0, 1.0]), bounds=bounds,
                    settings=s)
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x),
                               [1.0, 4.743, 3.821, 1.379], atol=1e-2)


def test_parametric_nlp():
    # parameter pytree: shifted quadratic, optimum tracks p
    nlp = NLP(cost=lambda x, p: jnp.sum((x - p["target"]) ** 2), n=3)
    sol = sqp_solve(nlp, jnp.zeros(3), p={"target": jnp.array([1.0, -2.0, 0.5])},
                    settings=SQPSettings(hessian="exact", qp=TIGHT_QP))
    assert int(sol.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(sol.x), [1.0, -2.0, 0.5], atol=1e-3)


def test_vmap_batch_of_instances():
    # batch over initial guesses AND parameters: statuses per instance
    nlp = NLP(cost=lambda x, p: jnp.sum((x - p) ** 2), n=2,
              eq=lambda x, p: jnp.array([x[0] + x[1] - 1.0]), ne=1)
    s = SQPSettings(hessian="exact", qp=TIGHT_QP)
    B = 8
    x0s = jnp.asarray(np.random.default_rng(0).normal(size=(B, 2)))
    ps = jnp.asarray(np.linspace(-1, 1, B)[:, None] * np.ones((B, 2)))
    sols = jax.vmap(lambda x0, p: sqp_solve(nlp, x0, p=p, settings=s))(x0s, ps)
    assert np.all(np.asarray(sols.status) == st.SOLVED)
    # optimum of min ||x-p||^2 st x0+x1=1 with p=(a,a): x = (a,a) + ((1-2a)/2)(1,1)
    for i in range(B):
        a = float(ps[i, 0])
        expect = a + (1 - 2 * a) / 2
        np.testing.assert_allclose(np.asarray(sols.x[i]),
                                   [expect, expect], atol=1e-3)


def test_max_iter_status():
    nlp = rosenbrock_nlp()
    s = SQPSettings(hessian="bfgs", max_iter=2, qp=TIGHT_QP,
                    eps_prim=1e-12, eps_dual=1e-12)
    sol = sqp_solve(nlp, jnp.array([-1.2, 1.0]), settings=s)
    assert int(sol.status) == st.MAX_ITER_EXCEEDED
    assert int(sol.iters) == 2


def test_iteration_trace():
    # per-iteration observability (the reference's iteration_callback,
    # sqp_base.hpp:33,685-686): the last recorded row must match the final
    # info, and rows past the final iteration stay NaN
    nlp = rosenbrock_nlp()
    s = SQPSettings(hessian="exact", max_iter=30, qp=TIGHT_QP,
                    trace_iters=30)
    sol = sqp_solve(nlp, jnp.array([-1.2, 1.0]), settings=s)
    assert int(sol.status) == st.SOLVED
    tr = np.asarray(sol.trace)
    k = int(sol.iters)
    assert tr.shape == (30, 4)
    assert np.all(np.isfinite(tr[:k]))
    assert np.all(np.isnan(tr[k:]))
    last = tr[k - 1]
    np.testing.assert_allclose(last[0], float(sol.cost), rtol=1e-6)
    np.testing.assert_allclose(last[1], float(sol.violation), atol=1e-12)
    np.testing.assert_allclose(last[2], float(sol.primal_step), rtol=1e-6)
    np.testing.assert_allclose(last[3], float(sol.dual_step), rtol=1e-6)
    # costs decrease over the trace for this well-behaved problem tail
    assert tr[k - 1, 0] <= tr[0, 0]


def test_regularize_modes_spectra():
    """Hessian regularisers: every mode must return finite PD matrices for
    indefinite inputs at any scale, and the matmul-only Newton-Schulz modes
    must match their eigh-computed semantics: "mirror" = |H| ("eigen",
    the reference's hand regulariser, mpc_wrapper_test.cpp:90-118),
    "clip" = PSD projection.  Regression: the sign iteration used to be
    scaled by a power-iteration norm *estimate*, which undershot on the
    race-car Hessian and silently produced NaN — freezing the whole SQP
    because every QP step was rejected."""
    from polympc_tpu.nlp.hessian import regularize

    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(4, 60))
        A = rng.standard_normal((n, n))
        H = jnp.asarray(0.5 * (A + A.T) * rng.uniform(0.1, 500))
        evH = np.linalg.eigvalsh(np.asarray(H, np.float64))
        top = np.max(np.abs(evH))
        for mode, target in [("mirror", np.abs(evH)),
                             ("clip", np.maximum(evH, 0.0)),
                             ("eigen", None), ("eigmin", None),
                             ("gershgorin", None), ("ridge", None)]:
            Hr = np.asarray(regularize(H, mode, 1e-7), np.float64)
            assert np.all(np.isfinite(Hr)), (trial, mode)
            ev = np.linalg.eigvalsh(Hr)
            if mode == "eigmin":
                # estimate-based: approximately PD by documented contract
                assert ev.min() > -0.05 * top, (trial, mode, ev.min())
            elif mode != "ridge":  # ridge can stay indefinite by design
                assert ev.min() > 0.0, (trial, mode, ev.min())
            if target is not None:
                rel = np.abs(np.sort(ev) - np.sort(target)) / top
                assert rel.max() < 2e-2, (trial, mode, rel.max())
