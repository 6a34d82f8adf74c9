"""QPLIB hard-QP parity fixtures.

The reference ships three QPLIB instances as CSV (P, q, A, l, u per
instance: tests/solvers/qp/qplib/{QP0018,QP0343,QP2712}) together with a CSV
loader (load_matrix_from_csv.hpp) — but no reference test ever reads them
(SURVEY.md §4).  Here they serve their intended purpose: a cross-solver
parity suite on dense 50-200 variable QPs.

The raw instances are nonconvex (indefinite P, eigenvalues spanning roughly
[-400, 400]); the convex solver stack is exercised on the eigenvalue-mirrored
convexification |P| — exactly the treatment the SQP applies to indefinite
Lagrangian Hessians (nlp/hessian.py regularize "eigen") — and boxADMM /
interior-point / Goldfarb-Idnani active set must agree to 1e-4.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.qp import QPData, ADMMSettings, box_admm_solve
from polympc_tpu.qp.ip import qp_ip_solve
from polympc_tpu.qp.active_set import qp_active_set_solve
from polympc_tpu.utils import status as st

QPLIB_DIR = "/root/reference/tests/solvers/qp/qplib"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QPLIB_DIR), reason="QPLIB fixture CSVs not available")


def load_instance(name):
    base = os.path.join(QPLIB_DIR, name)
    g = lambda f: np.genfromtxt(os.path.join(base, f + ".csv"), delimiter=",")
    P, q, A, l, u = g("P"), g("q"), g("A"), g("l"), g("u")
    # eigenvalue-mirrored convexification (deterministic, documented above)
    w, V = np.linalg.eigh(0.5 * (P + P.T))
    H = (V * np.maximum(np.abs(w), 1e-6)) @ V.T
    n = H.shape[0]
    inf = np.inf
    return QPData(H=jnp.asarray(H), h=jnp.asarray(q), A=jnp.asarray(A),
                  al=jnp.asarray(l), au=jnp.asarray(u),
                  xl=jnp.full(n, -inf), xu=jnp.full(n, inf))


@pytest.mark.parametrize("name", ["QP0018", "QP0343", "QP2712"])
def test_qplib_cross_solver_parity(name):
    qp = load_instance(name)
    sa = box_admm_solve(qp, settings=ADMMSettings(
        eps_abs=1e-6, eps_rel=1e-6, max_epochs=80))
    si = qp_ip_solve(qp)
    ss = qp_active_set_solve(qp)
    assert int(sa.status) == st.SOLVED
    assert int(si.status) == st.SOLVED
    assert int(ss.status) == st.SOLVED
    xa, xi, xs = map(np.asarray, (sa.x, si.x, ss.x))
    np.testing.assert_allclose(xa, xi, atol=1e-4)
    np.testing.assert_allclose(xa, xs, atol=1e-4)
    # primal feasibility of the agreed solution
    Ax = np.asarray(qp.A) @ xa
    assert np.all(Ax >= np.asarray(qp.al) - 1e-5)
    assert np.all(Ax <= np.asarray(qp.au) + 1e-5)
