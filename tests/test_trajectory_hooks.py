"""Trajectory-level cost/constraint hooks (GenericOCP's diff/ddiff rate
operators, generic_ocp.hpp:88-101): rate regularisation and hard rate
constraints on the mobile robot, plus spectral-operator exactness.
"""
import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.ocp import OCP, ocp_bounds, transcribe
from polympc_tpu.ocp.ocp import OCP as OCPclass
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

QP = ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6, max_epochs=40,
                  equil_iters=2)


def _with_rate_hooks(base: OCPclass, rate_bound: bool, rate_cost: bool):
    nu = base.nu

    traj_ineq = None
    ntg = 0
    if rate_bound:
        def traj_ineq(X, U, P, d, t, ops):
            # du/dt at every node for every control channel
            return (ops.D @ U).reshape(-1)
        ntg = 11 * nu  # N = 5*2+1 nodes

    traj_cost = None
    if rate_cost:
        def traj_cost(X, U, P, d, t, ops):
            dU = ops.D @ U
            return 0.5 * jnp.sum((dU * dU) * ops.w[:, None])

    import dataclasses
    return dataclasses.replace(base, trajectory_ineq=traj_ineq, ntg=ntg,
                               trajectory_cost=traj_cost)


def _solve(ocp, tgl=None, tgu=None):
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75],
                        x0=[0.5, 0.5, 0.5], tgl=tgl, tgu=tgu)
    z0 = tr.initial_guess(x0=jnp.asarray([0.5, 0.5, 0.5]))
    sol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds,
                    settings=SQPSettings(hessian="exact", max_iter=60, qp=QP))
    return tr, prm, sol


def test_spectral_ops_exact_derivative():
    # ops.D differentiates a cubic exactly on Chebyshev nodes
    ocp = robot_ocp()
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    t = np.asarray(mesh.time_nodes(0.0, 2.0))
    from polympc_tpu.ocp.transcription import SpectralOps
    NS = mesh.num_segments
    D = np.asarray(tr.Dg_unit) / ((2.0 - 0.0) / (2.0 * NS))
    y = t ** 3 - 2 * t
    dy = D @ y
    np.testing.assert_allclose(dy, 3 * t ** 2 - 2, atol=1e-9)


def test_rate_constraint_enforced():
    base = robot_ocp()
    ocp = _with_rate_hooks(base, rate_bound=True, rate_cost=False)
    rmax = 1.2
    N = 11
    tgl = -rmax * np.ones(N * base.nu)
    tgu = rmax * np.ones(N * base.nu)
    tr, prm, sol = _solve(ocp, tgl=tgl, tgu=tgu)
    assert int(sol.status) == st.SOLVED
    X, U, P = tr.unpack(sol.x)
    D = np.asarray(tr.Dg_unit) / (2.0 / (2.0 * tr.mesh.num_segments))
    dU = D @ np.asarray(U)
    assert np.max(np.abs(dU)) <= rmax + 1e-4
    # the unconstrained problem violates this rate bound (else test is vacuous)
    tr0, prm0, sol0 = _solve(base)
    X0, U0, _ = tr0.unpack(sol0.x)
    assert np.max(np.abs(D @ np.asarray(U0))) > rmax


def test_rate_regularisation_smooths_controls():
    base = robot_ocp()
    smooth = _with_rate_hooks(base, rate_bound=False, rate_cost=True)
    tr0, _, sol0 = _solve(base)
    tr1, _, sol1 = _solve(smooth)
    assert int(sol0.status) == st.SOLVED and int(sol1.status) == st.SOLVED
    D = np.asarray(tr0.Dg_unit) / (2.0 / (2.0 * tr0.mesh.num_segments))
    _, U0, _ = tr0.unpack(sol0.x)
    _, U1, _ = tr1.unpack(sol1.x)
    r0 = np.sum((D @ np.asarray(U0)) ** 2)
    r1 = np.sum((D @ np.asarray(U1)) ** 2)
    assert r1 < r0  # the regularised solution has smoother controls
