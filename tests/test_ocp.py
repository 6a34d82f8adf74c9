"""OCP transcription + end-to-end collocation NMPC tests.

Oracles (SURVEY.md §4/§8.1): RobotOCP tracking solve must converge with
defects satisfied; the collocation trajectory must match an independent RK4
integration of the same controls; minimum-time ParkingOCP recovers a sensible
time-scaling parameter; warm-started re-solves converge faster (the
cstr_control_test.cpp:137-183 pattern).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp, parking_ocp
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.ocp import transcribe, ocp_bounds, split_z
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

QP = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40)


@pytest.fixture(scope="module")
def robot_setup():
    ocp = robot_ocp()
    mesh = SegmentedBasis(Chebyshev(5), 2)  # 11 nodes
    tr = transcribe(ocp, mesh)
    return ocp, mesh, tr


def test_dims(robot_setup):
    ocp, mesh, tr = robot_setup
    assert tr.N == 11
    assert tr.nlp.n == 11 * 5
    assert tr.nlp.ne == 33
    assert tr.nlp.ni == 0


def test_defects_zero_for_exact_solution(robot_setup):
    # constant zero state/control satisfies dynamics exactly -> defects = 0
    ocp, mesh, tr = robot_setup
    z = tr.initial_guess()                       # zeros
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    defects = tr.nlp.eq(z, prm)
    np.testing.assert_allclose(np.asarray(defects), 0.0, atol=1e-12)


def test_defects_linear_dynamics_parity():
    # dx/dt = u with known cubic trajectory: defects vanish iff X matches
    from polympc_tpu.ocp import OCP, transcribe as trans
    ocp = OCP(dynamics=lambda x, u, p, d, t: u, nx=1, nu=1,
              lagrange=lambda x, u, p, d, t: x @ x)
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = trans(ocp, mesh)
    prm = tr.params(t0=0.0, tf=2.0)
    t = tr.tau * 2.0
    X = (t ** 2)[:, None]
    U = (2 * t)[:, None]
    from polympc_tpu.ocp import pack_z
    z = pack_z(jnp.asarray(X), jnp.asarray(U))
    np.testing.assert_allclose(np.asarray(tr.nlp.eq(z, prm)), 0.0, atol=1e-9)
    # quadrature cost = int_0^2 t^4 dt = 32/5 (degree 4: exact for CC order 5)
    np.testing.assert_allclose(float(tr.nlp.cost(z, prm)), 32.0 / 5.0,
                               rtol=1e-10)


def _solve_robot(tr, x0, hessian="exact", lam0=None, z0=None):
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75], x0=x0)
    z_init = tr.initial_guess(x0) if z0 is None else z0
    s = SQPSettings(hessian=hessian, max_iter=100, qp=QP)
    sol = sqp_solve(tr.nlp, z_init, p=prm, bounds=bounds, lam0=lam0,
                    settings=s)
    return sol, prm, bounds


@pytest.mark.parametrize("hessian", ["exact", "bfgs", "block_bfgs"])
def test_robot_nmpc_solve(robot_setup, hessian):
    ocp, mesh, tr = robot_setup
    x0 = jnp.array([0.5, 0.5, 0.5])
    sol, prm, bounds = _solve_robot(tr, x0, hessian)
    assert int(sol.status) == st.SOLVED
    X, U, P = split_z(sol.x, 3, 2, tr.N, 0)
    # initial condition pinned
    np.testing.assert_allclose(np.asarray(X[0]), np.asarray(x0), atol=1e-6)
    # regulation: final *position* close to origin (theta decay is not worth
    # its control cost at Q=R=1); cost cross-validated between Hessian modes
    assert float(jnp.linalg.norm(X[-1][:2])) < 0.3
    np.testing.assert_allclose(float(sol.cost), 1.27138, atol=1e-3)
    # control bounds respected
    assert np.all(np.abs(np.asarray(U)[:, 0]) <= 1.5 + 1e-6)
    assert np.all(np.abs(np.asarray(U)[:, 1]) <= 0.75 + 1e-6)
    # defects satisfied at solution
    np.testing.assert_allclose(np.asarray(tr.nlp.eq(sol.x, prm)), 0.0,
                               atol=1e-4)


def test_collocation_vs_rk4(robot_setup):
    """Independent cross-check: integrate the solved controls with RK4 on a
    fine grid; trajectory must match the collocation states (the analogue of
    the reference's dense_sparse_compare internal-consistency test)."""
    ocp, mesh, tr = robot_setup
    x0 = jnp.array([0.5, 0.5, 0.5])
    sol, prm, bounds = _solve_robot(tr, x0)
    X, U, P = split_z(sol.x, 3, 2, tr.N, 0)

    # dense control signal via Lagrange interpolation
    tq = np.linspace(0.0, 2.0, 201)
    Pmat = mesh.interp_matrix(tq, 0.0, 2.0)
    Uq = Pmat @ np.asarray(U)

    xs = np.asarray(x0, dtype=np.float64)
    d = np.array([2.0])
    h = tq[1] - tq[0]
    f = lambda x, u: np.asarray(ocp.dynamics(jnp.asarray(x), jnp.asarray(u),
                                             jnp.zeros(0), jnp.asarray(d), 0.0))
    traj = [xs]
    for k in range(len(tq) - 1):
        u_mid = 0.5 * (Uq[k] + Uq[k + 1])
        k1 = f(xs, Uq[k])
        k2 = f(xs + 0.5 * h * k1, u_mid)
        k3 = f(xs + 0.5 * h * k2, u_mid)
        k4 = f(xs + h * k3, Uq[k + 1])
        xs = xs + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        traj.append(xs)
    traj = np.asarray(traj)
    # compare at collocation nodes
    Pn = mesh.interp_matrix(tr.tau * 2.0, 0.0, 2.0)
    rk4_at_nodes = np.stack([np.interp(tr.tau * 2.0, tq, traj[:, i])
                             for i in range(3)], axis=1)
    # order-5 collocation with saturated (non-polynomial) controls carries
    # O(1e-2) discretisation error on this problem; parity is structural
    np.testing.assert_allclose(rk4_at_nodes, np.asarray(X), atol=5e-2)


def test_warm_start_fewer_iters(robot_setup):
    # cstr_control_test.cpp:167-177 pattern: re-solve from perturbed x0 with
    # warm start must converge and not be slower
    ocp, mesh, tr = robot_setup
    x0 = jnp.array([0.5, 0.5, 0.5])
    cold, prm, bounds = _solve_robot(tr, x0)
    x0b = jnp.array([0.52, 0.49, 0.5])
    warm, _, _ = _solve_robot(tr, x0b, z0=cold.x, lam0=cold.lam)
    assert int(warm.status) == st.SOLVED
    assert int(warm.iters) <= int(cold.iters)


def test_minimum_time_parking():
    # ParkingOCP exactly as minimal_time_test.cpp:146-186: wheelbase 1.0,
    # x0=(1.5,0.5,0.5), final state in +-0.05 box, time guess p0=0.5,
    # p in [0,10], u in [-1.5,1.5]x[-0.75,0.75]
    ocp = parking_ocp()
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    x0 = [1.5, 0.5, 0.5]
    prm = tr.params(d=[1.0], t0=0.0, tf=1.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75],
                        pl=[0.0], pu=[10.0], x0=x0)
    # final-state box +-0.05 (final_state_bounds in the reference)
    nxN = tr.N * 3
    lbx = bounds.lbx.at[nxN - 3:nxN].set(-0.05)
    ubx = bounds.ubx.at[nxN - 3:nxN].set(0.05)
    bounds = bounds._replace(lbx=lbx, ubx=ubx)
    z0 = tr.initial_guess(x0).at[-1].set(0.5)  # time guess ("very important")
    s = SQPSettings(hessian="exact", max_iter=50, qp=QP)
    sol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds, settings=s)
    assert int(sol.status) == st.SOLVED
    assert int(sol.iters) < 50
    X, U, P = split_z(sol.x, 3, 2, tr.N, 1)
    t_final = float(P[0])
    assert 0.5 < t_final < 5.0
    assert np.all(np.abs(np.asarray(X[-1])) <= 0.05 + 1e-4)
    # min-time solutions are bang-bang-ish: speed at its bound somewhere
    assert np.max(np.abs(np.asarray(U)[:, 0])) > 1.4


def test_nonlinear_constraint_path():
    # NG=1 generic inequality (nonlinear_constraints_test.cpp:63-70)
    ocp = parking_ocp(nonlinear_constraint=True)
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    assert tr.nlp.ni == tr.N
    x0 = [1.5, 0.5, 0.5]
    prm = tr.params(d=[1.0], t0=0.0, tf=1.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75],
                        pl=[0.0], pu=[10.0], gl=[-1.5], gu=[1.5], x0=x0)
    nxN = tr.N * 3
    bounds = bounds._replace(
        lbx=bounds.lbx.at[nxN - 3:nxN].set(-0.05),
        ubx=bounds.ubx.at[nxN - 3:nxN].set(0.05))
    z0 = tr.initial_guess(x0).at[-1].set(0.5)
    s = SQPSettings(hessian="exact", max_iter=50, qp=QP)
    sol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds, settings=s)
    assert int(sol.status) == st.SOLVED
    g = np.asarray(tr.nlp.ineq(sol.x, prm))
    assert np.all(g <= 1.5 + 1e-4) and np.all(g >= -1.5 - 1e-4)


def test_block_bfgs_storage_scales_linearly():
    """The block quasi-Newton carries N*(nx^2+nu^2+nx*nu) + n*np + np^2
    floats instead of the dense n^2 — the reference's sparsity-preserving
    BFGS memory win (continuous_ocp.hpp:2304-2431), decisive at N >= 41."""
    from polympc_tpu.nlp.hessian import (
        block_hessian_identity, assemble_block_hessian, block_bfgs_update,
        block_hessian_matvec, bfgs_update)
    N, nx, nu, np_ = 41, 3, 2, 1
    n = N * (nx + nu) + np_
    B = block_hessian_identity(N, nx, nu, np_)
    n_block = sum(np.prod(a.shape) for a in B)
    assert n_block < 0.05 * n * n  # >20x memory saving at N=41
    # parity of the block update against the dense damped BFGS restricted to
    # the block sparsity pattern
    rng = np.random.default_rng(1)
    s_vec = jnp.asarray(rng.normal(size=n))
    y_vec = jnp.asarray(rng.normal(size=n))
    # make curvature positive so the damping branch is deterministic
    y_vec = y_vec + 2.0 * s_vec
    B2 = block_bfgs_update(B, s_vec, y_vec, N, nx, nu)
    H2 = np.asarray(assemble_block_hessian(B2, N, nx, nu))
    Hd = np.asarray(bfgs_update(jnp.eye(n), s_vec, y_vec))
    # on-pattern entries match the dense update exactly
    H2_dense_pattern = np.where(H2 != np.asarray(
        assemble_block_hessian(B, N, nx, nu)), Hd, H2)
    mask = np.asarray(assemble_block_hessian(
        block_hessian_identity(N, nx, nu, np_)._replace(
            xx=jnp.ones((N, nx, nx)), uu=jnp.ones((N, nu, nu)),
            xu=jnp.ones((N, nx, nu)), ap=jnp.ones((N * (nx + nu), np_)),
            pp=jnp.ones((np_, np_))), N, nx, nu)) != 0
    np.testing.assert_allclose(H2[mask], Hd[mask], rtol=1e-10, atol=1e-12)
    # matvec consistency with the assembled matrix
    v = block_hessian_matvec(B2, s_vec, N, nx, nu)
    np.testing.assert_allclose(np.asarray(v), H2 @ np.asarray(s_vec),
                               rtol=1e-10, atol=1e-12)
