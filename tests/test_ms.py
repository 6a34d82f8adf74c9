"""Multiple-shooting and soft-defect transcription tests.

Cross-validation: the same RobotOCP solved by pseudospectral collocation,
multiple shooting, and soft-penalty collocation must agree on the optimal
cost (the reference carries MSChebyshev/chebyshev_soft for the same purpose).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.ocp import (
    transcribe, transcribe_ms, ocp_bounds, ms_bounds, split_z,
)
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

QP = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40)
S = SQPSettings(hessian="exact", max_iter=100, qp=QP)
X0 = [0.5, 0.5, 0.5]


def _collocation_cost():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75], x0=X0)
    sol = sqp_solve(tr.nlp, tr.initial_guess(X0), p=prm, bounds=bounds,
                    settings=S)
    assert int(sol.status) == st.SOLVED
    return float(sol.cost)


def test_multiple_shooting_robot():
    tr = transcribe_ms(robot_ocp(), num_segments=10, steps_per_segment=4)
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ms_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75], x0=X0)
    sol = sqp_solve(tr.nlp, tr.initial_guess(X0), p=prm, bounds=bounds,
                    settings=S)
    assert int(sol.status) == st.SOLVED
    X, U, P = tr.split(sol.x)
    np.testing.assert_allclose(np.asarray(X[0]), X0, atol=1e-8)
    # continuity satisfied
    np.testing.assert_allclose(np.asarray(tr.nlp.eq(sol.x, prm)), 0.0,
                               atol=1e-4)
    # same optimal cost as collocation (different discretisations: ~1%)
    c_ps = _collocation_cost()
    np.testing.assert_allclose(float(sol.cost), c_ps, rtol=2e-2)


def test_soft_defects_robot():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2),
                    soft_defects=1e4)
    assert tr.nlp.ne == 0
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75], x0=X0)
    # the 1e4 penalty makes the Hessian stiff: exact Newton + relaxed step
    # tolerance (the penalty valley floor is flat at the 1e-3 scale)
    sol = sqp_solve(tr.nlp, tr.initial_guess(X0), p=prm, bounds=bounds,
                    settings=SQPSettings(hessian="exact", max_iter=150,
                                         eps_prim=5e-3, eps_stat=0.5, qp=QP))
    assert int(sol.status) == st.SOLVED
    c_ps = _collocation_cost()
    # penalty formulation approaches the constrained optimum from below-ish
    assert abs(float(sol.cost) - c_ps) / c_ps < 0.1
