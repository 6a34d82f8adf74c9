"""Distributed constrained SQP (BASELINE config 5): the duplicated-segment
formulation must reproduce the fused single-chip transcription's solution —
bounds, inequalities and global parameters included — locally and over the
8-device fake mesh.  1e-6 parity is certified through the distributed
Newton-KKT refinement (dist_refine), mirroring the fused path's
nlp/refine.py pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control.nmpf import augment_ocp
from polympc_tpu.models import (
    kite_dynamics, kite_output, kite_path, parking_ocp,
)
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.nlp.refine import kkt_residual, refine_solution
from polympc_tpu.ocp import transcribe, ocp_bounds
from polympc_tpu.parallel import (
    DistSQPSettings, dist_transcribe, dist_bounds, dist_sqp_solve,
    fused_to_segments, segments_to_fused,
)
from polympc_tpu.parallel.dist_sqp import dist_refine, dist_kkt_residual
from polympc_tpu.parallel.horizon import horizon_mesh
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

TIGHT_FUSED = SQPSettings(
    hessian="exact", max_iter=60,
    qp=ADMMSettings(eps_abs=1e-8, eps_rel=1e-8, max_epochs=60))


def _kite_setup():
    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    x0 = [0.6, 0.4, 0.0, 0.0, 0.05]
    kw = dict(ul=[-5.0, -10.0], uu=[5.0, 10.0],
              xl=[0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
              xu=[np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0])
    return ocp, x0, kw, 0.0, 2.0, [0.05]


def test_dist_matches_fused_kite_s8_to_1e6():
    """Kite NMPF with control/state bounds (kite_control_test.cpp:38-52)
    over S=8 segments: distributed solve + distributed refinement must
    certify KKT <= 1e-6 and match the refined fused solution to 1e-6."""
    ocp, x0, kw, t0, tf, d = _kite_setup()
    S = 8
    # fused oracle, refined to an exact KKT point
    tr = transcribe(ocp, SegmentedBasis(Chebyshev(5), S))
    prm = tr.params(d=d, t0=t0, tf=tf)
    bnd = ocp_bounds(tr, x0=x0, **kw)
    z0 = tr.rollout_guess(jnp.asarray(x0, jnp.float64), prm)
    fsol = sqp_solve(tr.nlp, z0, p=prm, bounds=bnd, settings=TIGHT_FUSED)
    assert int(fsol.status) == st.SOLVED
    zf, lf, lbf = refine_solution(tr.nlp, fsol.x, fsol.lam, fsol.lam_box,
                                  bnd, prm, iters=2)
    assert float(kkt_residual(tr.nlp, zf, lf, lbf, bnd, prm).max) <= 1e-6
    Xf, Uf, _ = tr.unpack(zf)

    # distributed solve at standard tolerances + distributed refinement
    dtr = dist_transcribe(ocp, Chebyshev(5), S, t0, tf)
    bounds = dist_bounds(dtr, x0=x0, **kw)
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=d)
    out = dist_sqp_solve(dtr, bounds, W0, P0, d=d,
                         settings=DistSQPSettings(max_iter=60,
                                                  admm_iters=400))
    assert int(out["status"]) == st.SOLVED, (
        float(out["violation"]), float(out["primal_step"]))
    W, P, ll, li, lbw, lbp = dist_refine(
        dtr, bounds, out["W"], out["P"], out["lam_loc"], out["lam_if"],
        out["lam_bw"], out["lam_bp"], d=d, iters=4)
    r = dist_kkt_residual(dtr, bounds, W, P, ll, li, lbw, lbp, d=d)
    assert float(r) <= 1e-6, float(r)

    # duplicated interface copies agree, and the primal matches the fused
    # refined solution to 1e-6 (the config-5 parity bar)
    Xs, _ = dtr.split(W)
    np.testing.assert_allclose(np.asarray(Xs[:-1, -1]), np.asarray(Xs[1:, 0]),
                               atol=1e-9)
    Xd, Ud = segments_to_fused(dtr, W)
    np.testing.assert_allclose(np.asarray(Xd), np.asarray(Xf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ud), np.asarray(Uf), atol=1e-6)


def test_dist_matches_fused_parking_params_ineq():
    """Minimum-time parking with a global time-scaling parameter (the
    Schur border) and a nonlinear per-node inequality (ng=1)."""
    ocp = parking_ocp(nonlinear_constraint=True)
    x0 = [1.5, 0.5, 0.5]
    kw = dict(ul=[-1.5, -0.75], uu=[1.5, 0.75], gl=[-10.0], gu=[1.5])
    S = 4
    tr = transcribe(ocp, SegmentedBasis(Chebyshev(5), S))
    prm = tr.params(d=[1.0], t0=0.0, tf=1.0)
    bounds_f = ocp_bounds(tr, x0=x0, pl=[0.0], pu=[10.0], **kw)
    nxN = tr.N * 3
    bounds_f = bounds_f._replace(
        lbx=bounds_f.lbx.at[nxN - 3:nxN].set(-0.05),
        ubx=bounds_f.ubx.at[nxN - 3:nxN].set(0.05))
    z0 = tr.rollout_guess(jnp.asarray(x0, jnp.float64), prm).at[-1].set(0.5)
    fsol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds_f,
                     settings=TIGHT_FUSED)
    assert int(fsol.status) == st.SOLVED
    zf, lf, lbf = refine_solution(tr.nlp, fsol.x, fsol.lam, fsol.lam_box,
                                  bounds_f, prm, iters=4)
    Xf, Uf, Pf = tr.unpack(zf)

    dtr = dist_transcribe(ocp, Chebyshev(5), S, 0.0, 1.0)
    bounds = dist_bounds(dtr, x0=x0, pl=[0.0], pu=[10.0], **kw)
    nx = 3
    tail = slice((dtr.N - 1) * nx, dtr.N * nx)
    bounds = bounds._replace(
        lbw=bounds.lbw.at[-1, tail].set(-0.05),
        ubw=bounds.ubw.at[-1, tail].set(0.05))
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=[1.0])
    P0 = P0.at[0].set(0.5)
    out = dist_sqp_solve(dtr, bounds, W0, P0, d=[1.0],
                         settings=DistSQPSettings(max_iter=80,
                                                  admm_iters=600))
    assert int(out["status"]) == st.SOLVED, (
        float(out["violation"]), float(out["primal_step"]))
    W, P, ll, li, lbw, lbp = dist_refine(
        dtr, bounds, out["W"], out["P"], out["lam_loc"], out["lam_if"],
        out["lam_bw"], out["lam_bp"], d=[1.0], iters=4)
    r = dist_kkt_residual(dtr, bounds, W, P, ll, li, lbw, lbp, d=[1.0])
    assert float(r) <= 1e-6, float(r)
    np.testing.assert_allclose(float(P[0]), float(Pf[0]), atol=1e-8)
    Xd, Ud = segments_to_fused(dtr, W)
    np.testing.assert_allclose(np.asarray(Xd), np.asarray(Xf), atol=1e-8)


def test_dist_on_mesh_matches_local():
    """The mesh-sharded solve must match the local (vmap) solve —
    collectives change the schedule, not the math."""
    assert len(jax.devices()) == 8
    ocp, x0, kw, t0, tf, d = _kite_setup()
    dtr = dist_transcribe(ocp, Chebyshev(5), 8, t0, tf)
    bounds = dist_bounds(dtr, x0=x0, **kw)
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=d)
    settings = DistSQPSettings(max_iter=8, admm_iters=150)
    out_loc = dist_sqp_solve(dtr, bounds, W0, P0, d=d, settings=settings)
    mesh = horizon_mesh(8)
    out_mesh = dist_sqp_solve(dtr, bounds, W0, P0, d=d, settings=settings,
                              mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_mesh["W"]),
                               np.asarray(out_loc["W"]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_mesh["P"]),
                               np.asarray(out_loc["P"]), atol=1e-7)


def test_dist_refine_on_mesh_matches_local():
    assert len(jax.devices()) == 8
    ocp, x0, kw, t0, tf, d = _kite_setup()
    dtr = dist_transcribe(ocp, Chebyshev(5), 8, t0, tf)
    bounds = dist_bounds(dtr, x0=x0, **kw)
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=d)
    out = dist_sqp_solve(dtr, bounds, W0, P0, d=d,
                         settings=DistSQPSettings(max_iter=30,
                                                  admm_iters=300))
    args = (out["W"], out["P"], out["lam_loc"], out["lam_if"],
            out["lam_bw"], out["lam_bp"])
    loc = dist_refine(dtr, bounds, *args, d=d, iters=2)
    mesh = horizon_mesh(8)
    shd = dist_refine(dtr, bounds, *args, d=d, iters=2, mesh=mesh)
    for a, b in zip(loc, shd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_fused_segment_roundtrip():
    ocp, x0, kw, t0, tf, d = _kite_setup()
    dtr = dist_transcribe(ocp, Chebyshev(5), 4, t0, tf)
    rng = np.random.default_rng(0)
    Ng = 5 * 4 + 1
    X = rng.normal(size=(Ng, 5))
    U = rng.normal(size=(Ng, 2))
    W = fused_to_segments(dtr, X, U)
    X2, U2 = segments_to_fused(dtr, W)
    np.testing.assert_allclose(np.asarray(X2), X, atol=1e-12)
    np.testing.assert_allclose(np.asarray(U2), U, atol=1e-12)


def test_dist_transcribe_rejects_single_segment():
    ocp = parking_ocp()
    with pytest.raises(ValueError, match="S >= 2"):
        dist_transcribe(ocp, Chebyshev(5), S=1, t0=0.0, tf=1.0)
