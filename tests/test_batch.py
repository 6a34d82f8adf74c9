"""Batched solving + sharding tests (fake 8-device CPU mesh, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.ocp import transcribe, ocp_bounds
from polympc_tpu.parallel import make_batch_solver, batch_mesh
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

QP = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40)
S = SQPSettings(hessian="exact", max_iter=60, qp=QP)


def _setup():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75])
    return tr, prm, bounds


def test_batch_solver_all_converge():
    tr, prm, bounds = _setup()
    solve = make_batch_solver(tr, bounds, prm, S)
    rng = np.random.default_rng(0)
    B = 16
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)))
    sols = solve(x0s)
    assert np.all(np.asarray(sols.status) == st.SOLVED)
    # each instance pinned its own x0
    X0 = np.asarray(sols.x[:, :3]) * np.asarray(tr.x_scale)
    np.testing.assert_allclose(X0, np.asarray(x0s), atol=1e-8)


def test_batch_matches_single():
    tr, prm, bounds = _setup()
    from polympc_tpu.nlp import sqp_solve
    solve = make_batch_solver(tr, bounds, prm, S)
    x0 = jnp.array([0.5, 0.5, 0.5])
    sols = solve(jnp.tile(x0[None], (4, 1)))
    # single-instance reference
    b1 = bounds._replace(lbx=bounds.lbx.at[:3].set(x0),
                         ubx=bounds.ubx.at[:3].set(x0))
    z0 = tr.initial_guess(x0)
    single = sqp_solve(tr.nlp, z0, p=prm, bounds=b1, settings=S)
    # batched LU lowers differently from single LU; agreement is bounded by
    # the SQP termination tolerance, not machine precision
    np.testing.assert_allclose(np.asarray(sols.x[0]), np.asarray(single.x),
                               atol=2e-3)
    np.testing.assert_allclose(float(sols.cost[0]), float(single.cost),
                               rtol=1e-6)


def test_batch_sharded_over_mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    tr, prm, bounds = _setup()
    mesh = batch_mesh()
    solve = make_batch_solver(tr, bounds, prm, S, mesh=mesh)
    rng = np.random.default_rng(1)
    B = 32  # 4 per device
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)))
    sols = solve(x0s)
    assert np.all(np.asarray(sols.status) == st.SOLVED)
    # result really is sharded over the mesh
    assert len(sols.x.sharding.device_set) == 8


def test_batch_dist_2d_mesh_composed():
    """Composed dp x seg 2-D mesh (SURVEY §2.3 P4 / VERDICT r3 item 5): a
    batch of horizon-partitioned kite solves on a (2, 4) mesh, batch
    sharded over "dp", segments over "seg", with per-lane parity against
    the unsharded local solver."""
    from polympc_tpu.control.nmpf import augment_ocp
    from polympc_tpu.models import kite_dynamics, kite_output, kite_path
    from polympc_tpu.basis import Chebyshev
    from polympc_tpu.parallel import (
        DistSQPSettings, dist_transcribe, dist_bounds, dist_sqp_solve,
        mesh_2d, make_batch_dist_solver, initialize_multihost)

    # single-process bootstrap is a no-op
    assert initialize_multihost() is False

    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    Sg = 4
    dtr = dist_transcribe(ocp, Chebyshev(3), Sg, 0.0, 2.0)
    bounds = dist_bounds(dtr, x0=[0.6, 0.4, 0.0, 0.0, 0.05],
                         ul=[-5.0, -10.0], uu=[5.0, 10.0],
                         xl=[0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
                         xu=[np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0])
    mesh = mesh_2d(2, 4)
    settings = DistSQPSettings(max_iter=25, admm_iters=200)
    solver = make_batch_dist_solver(dtr, bounds, settings, mesh, d=[0.05])

    B = 4
    rng = np.random.default_rng(0)
    x0s = np.stack([rng.uniform(0.4, 0.8, B), rng.uniform(-0.4, 0.4, B),
                    np.zeros(B), rng.uniform(0, 6, B),
                    np.full(B, 0.05)], axis=1)
    W0s = jnp.stack([dtr.rollout_guess(jnp.asarray(x0s[b]), d=[0.05])[0]
                     for b in range(B)])
    P0s = jnp.zeros((B, 0))
    out = solver(jnp.asarray(x0s), W0s, P0s)
    jax.block_until_ready(out["W"])
    assert out["W"].shape == (B, Sg, dtr.kz)
    # really laid out over all 8 devices of the 2-D mesh
    assert len(out["W"].sharding.device_set) == 8

    # per-lane parity against the unsharded local dist solver
    for b in range(2):
        lb = bounds._replace(lbw=bounds.lbw.at[0, :5].set(x0s[b]),
                             ubw=bounds.ubw.at[0, :5].set(x0s[b]))
        ref = dist_sqp_solve(dtr, lb, W0s[b], P0s[b], d=[0.05],
                             settings=settings)
        assert int(np.asarray(out["status"])[b]) == int(ref["status"])
        np.testing.assert_allclose(np.asarray(out["W"])[b],
                                   np.asarray(ref["W"]), atol=1e-8)
