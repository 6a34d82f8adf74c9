"""Tracking NMPC controller + standalone collocation operators.

Oracles: the collocation operators must agree with the full transcription
(internal-consistency pattern, SURVEY.md §4), spectral defects of an exact
polynomial trajectory vanish, and the NMPC regulates the CSTR to its
setpoint (cstr_control_test.cpp:137-183 behavior through the nmpc.hpp-style
API).
"""
import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control import NMPC, tracking_ocp
from polympc_tpu.models import robot_ocp
from polympc_tpu.models.cstr import (
    CSTR_ULB, CSTR_UUB, CSTR_US, CSTR_X0, CSTR_XS, _cstr_rhs,
)
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.ocp import (
    collocate_constraints, collocate_cost, collocate_dynamics, transcribe,
)
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

MESH = SegmentedBasis(Chebyshev(5), 2)


def test_collocate_dynamics_matches_transcription():
    ocp = robot_ocp()
    tr = transcribe(ocp, MESH)
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    cd = collocate_dynamics(ocp.dynamics, MESH, nx=3, nu=2)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(tr.N, 3)))
    U = jnp.asarray(rng.normal(size=(tr.N, 2)))
    g1 = np.asarray(cd.defects(X, U, jnp.zeros(0), jnp.asarray([2.0]),
                               0.0, 2.0)).reshape(-1)
    z = tr.pack(X, U)
    g2 = np.asarray(tr.nlp.eq(z, prm))
    np.testing.assert_allclose(g1, g2, atol=1e-12)
    # Jacobian vs jacfwd of the defect map
    J = np.asarray(cd.jacobian(X, U, jnp.zeros(0), jnp.asarray([2.0]),
                               0.0, 2.0))
    flat = lambda v: cd.defects(v[:tr.N * 3].reshape(tr.N, 3),
                                v[tr.N * 3:].reshape(tr.N, 2),
                                jnp.zeros(0), jnp.asarray([2.0]),
                                0.0, 2.0).reshape(-1)
    J_ref = np.asarray(jax.jacfwd(flat)(jnp.concatenate(
        [X.reshape(-1), U.reshape(-1)])))
    np.testing.assert_allclose(J, J_ref, atol=1e-10)


def test_collocate_dynamics_exact_for_polynomial():
    # x(t) = (t^3, t) with dynamics f = (3 t^2, 1): defects vanish
    cd = collocate_dynamics(
        lambda x, u, p, d, t: jnp.array([3.0 * t ** 2, 1.0]),
        MESH, nx=2, nu=1)
    t = jnp.asarray(MESH.time_nodes(0.0, 2.0))
    X = jnp.stack([t ** 3, t], axis=1)
    U = jnp.zeros((len(t), 1))
    g = np.asarray(cd.defects(X, U, None, None, 0.0, 2.0))
    assert np.max(np.abs(g)) < 1e-10


def test_collocate_cost_quadrature():
    # integral of L = t^2 over [0,2] = 8/3; Mayer = x0(tf) with x0 = t -> 2
    cc = collocate_cost(lambda x, u, p, d, t: t ** 2,
                        lambda x, p, d: x[0], MESH)
    t = jnp.asarray(MESH.time_nodes(0.0, 2.0))
    X = t[:, None]
    U = jnp.zeros((len(t), 0))
    v = float(cc.value(X, U, None, None, 0.0, 2.0))
    np.testing.assert_allclose(v, 8.0 / 3.0 + 2.0, rtol=1e-10)
    gX, gU = cc.gradient(X, U, None, None, 0.0, 2.0)
    # only the Mayer term depends on X: d/dX[-1,0] = 1
    g = np.asarray(gX)
    assert abs(g[-1, 0] - 1.0) < 1e-10
    assert np.max(np.abs(g[:-1])) < 1e-10


def test_collocate_constraints_jacobian():
    ineq = lambda x, u, p, d, t: jnp.array([x[0] * u[0], x[1] ** 2])
    cc = collocate_constraints(ineq, ng=2, mesh=MESH, nx=2, nu=1)
    rng = np.random.default_rng(1)
    N = MESH.num_nodes
    X = jnp.asarray(rng.normal(size=(N, 2)))
    U = jnp.asarray(rng.normal(size=(N, 1)))
    J = np.asarray(cc.jacobian(X, U))
    flat = lambda v: cc.value(v[:N * 2].reshape(N, 2),
                              v[N * 2:].reshape(N, 1)).reshape(-1)
    J_ref = np.asarray(jax.jacfwd(flat)(
        jnp.concatenate([X.reshape(-1), U.reshape(-1)])))
    np.testing.assert_allclose(J, J_ref, atol=1e-12)


def test_nmpc_tracks_cstr_setpoint():
    nmpc = NMPC(lambda x, u, d, t: _cstr_rhs(x, u),
                nx=4, nu=2, tf=100.0,
                Q=np.diag([0.2, 1.0, 0.5, 0.2]),
                R=np.diag([0.5, 5e-7]),
                x_scale=[2.0, 1.0, 100.0, 100.0],
                u_scale=[35.0, 9000.0],
                settings=SQPSettings(
                    hessian="exact", max_iter=80,
                    qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6,
                                    max_epochs=40, equil_iters=4)))
    nmpc.set_reference(CSTR_XS, CSTR_US)
    nmpc.control_bounds(CSTR_ULB, CSTR_UUB)
    u0, sol = nmpc.compute_control(CSTR_X0)
    assert int(sol.status) == st.SOLVED
    assert CSTR_ULB[0] - 1e-6 <= u0[0] <= CSTR_UUB[0] + 1e-6
    # horizon end makes clear progress toward the setpoint (the reference's
    # own oracle is SOLVED-only, cstr_control_test.cpp:137-183 — on this slow
    # plant 100 s does not fully settle)
    X = np.asarray(nmpc.optimal_trajectory())
    xs = np.asarray(CSTR_XS)
    e0 = np.linalg.norm((np.asarray(CSTR_X0) - xs) / xs)
    eT = np.linalg.norm((X[-1] - xs) / xs)
    assert eT < 0.75 * e0
    assert abs(X[-1, 0] - xs[0]) / xs[0] < 0.05  # c_A essentially reached
    # warm-started re-solve from a nearby state: SOLVED, fewer iters
    u1, sol2 = nmpc.compute_control(np.asarray(CSTR_X0)
                                    + np.array([0.1, 0.008, 0.5, 0.1]))
    assert int(sol2.status) == st.SOLVED
    # warm-started: converges in a handful of iterations
    assert int(sol2.iters) <= 10
