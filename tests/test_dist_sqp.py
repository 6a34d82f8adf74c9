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


# ---------------------------------------------------------------------------
# inner-ADMM parity with the fused solver (round-4: adaptive rho, residual
# termination, certificates — VERDICT item 4)
# ---------------------------------------------------------------------------

def _segment_qp(seed=0, S=3, kz=6, ml=4, p_if=2, np_=1):
    """A random segment-structured QP and its fused (stacked) equivalent."""
    import types
    rng = np.random.default_rng(seed)
    Hs = np.stack([(lambda a: a @ a.T + np.eye(kz))(
        rng.standard_normal((kz, kz))) for _ in range(S)])
    HsP = rng.standard_normal((S, kz, np_)) * 0.3
    HPP = np.eye(np_) * 2.0
    gW = rng.standard_normal((S, kz))
    gP = rng.standard_normal(np_)
    A = rng.standard_normal((S, ml, kz))
    AP = rng.standard_normal((S, ml, np_)) * 0.2
    al = np.tile(np.array([0.0, 0.0, -1.0, -np.inf]), (S, 1))
    au = np.tile(np.array([0.0, 0.0, 1.0, 2.0]), (S, 1))
    lw = np.full((S, kz), -2.0)
    uw = np.full((S, kz), 2.0)
    lp = np.full(np_, -3.0)
    up = np.full(np_, 3.0)
    Epk = np.zeros((p_if, kz)); Epk[0, kz - 2] = 1; Epk[1, kz - 1] = 1
    Fpk = np.zeros((p_if, kz)); Fpk[0, 0] = -1; Fpk[1, 1] = -1
    r_if = np.zeros((S - 1, p_if))
    dtr = types.SimpleNamespace(S=S, kz=kz, ml=ml, p_if=p_if,
                                picks=(Epk, Fpk),
                                ocp=types.SimpleNamespace(np_=np_))
    # fused stacked equivalent: x = [w_0 .. w_{S-1}, P]
    n = S * kz + np_
    Hf = np.zeros((n, n)); hf = np.zeros(n)
    for s_ in range(S):
        sl = slice(s_ * kz, (s_ + 1) * kz)
        Hf[sl, sl] = Hs[s_]
        Hf[sl, S * kz:] = HsP[s_]
        Hf[S * kz:, sl] = HsP[s_].T
        hf[sl] = gW[s_]
    Hf[S * kz:, S * kz:] = HPP
    hf[S * kz:] = gP
    rows, rl, ru = [], [], []
    for s_ in range(S):
        R = np.zeros((ml, n))
        R[:, s_ * kz:(s_ + 1) * kz] = A[s_]
        R[:, S * kz:] = AP[s_]
        rows.append(R); rl.append(al[s_]); ru.append(au[s_])
    for i in range(S - 1):
        R = np.zeros((p_if, n))
        R[:, i * kz:(i + 1) * kz] = Epk
        R[:, (i + 1) * kz:(i + 2) * kz] = Fpk
        rows.append(R); rl.append(-r_if[i]); ru.append(-r_if[i])
    from polympc_tpu.qp.types import QPData
    qp = QPData(*(jnp.asarray(v) for v in (
        Hf, hf, np.concatenate(rows), np.concatenate(rl),
        np.concatenate(ru),
        np.concatenate([lw.reshape(-1), lp]),
        np.concatenate([uw.reshape(-1), up]))))
    dist_args = tuple(jnp.asarray(v) for v in (
        Hs, HsP, HPP, gW, gP, A, AP, al, au, lw, uw, lp, up, r_if))
    return dtr, dist_args, qp


@pytest.mark.parametrize("adaptive", [False, True])
def test_dist_admm_matches_fused_qp(adaptive):
    """The distributed inner ADMM solves the identical QP to the same
    answer as the fused boxADMM, with rho adaptation behaving identically
    (VERDICT r3 item 4: rho-adaptation parity on an identical QP)."""
    from polympc_tpu.parallel.dist_sqp import _dist_admm, DistSQPSettings
    from polympc_tpu.qp.box_admm import box_admm_solve
    from polympc_tpu.qp.types import ADMMSettings

    dtr, args, qp = _segment_qp()
    S, kz, ml, p_if, np_ = dtr.S, dtr.kz, dtr.ml, dtr.p_if, dtr.ocp.np_
    s = DistSQPSettings(admm_iters=2000, check_every=25, eps_abs=1e-6,
                        eps_rel=1e-6, adaptive_rho=adaptive, rho=0.1)
    out = _dist_admm(dtr, *args,
                     jnp.zeros((S, ml)), jnp.zeros((S - 1, p_if)),
                     jnp.zeros((S, kz)), jnp.zeros(np_), s, None, "seg")
    xW, xP, yl, yi, ybW, ybP, iters, status, rp, rd = out
    assert int(status) == st.SOLVED
    # early residual-based termination: far fewer iterations than the cap
    assert int(iters) < 2000, int(iters)

    fs = ADMMSettings(rho=0.1, eps_abs=1e-6, eps_rel=1e-6, max_epochs=80,
                      check_every=25, adaptive_rho=adaptive, polish=False)
    fsol = box_admm_solve(qp, settings=fs)
    assert int(fsol.status) == st.SOLVED
    xd = np.concatenate([np.asarray(xW).reshape(-1), np.asarray(xP)])
    np.testing.assert_allclose(xd, np.asarray(fsol.x), atol=1e-6)
    # identical epoch structure + identical residual/rho formulas => the
    # two solvers take the same number of iterations
    assert int(iters) == int(fsol.iters), (int(iters), int(fsol.iters))


def test_dist_admm_infeasibility_certificate():
    """A primal-infeasible segment QP is certified INFEASIBLE (OSQP §3.4),
    matching the fused solver's certificate."""
    from polympc_tpu.parallel.dist_sqp import _dist_admm, DistSQPSettings
    from polympc_tpu.qp.box_admm import box_admm_solve
    from polympc_tpu.qp.types import ADMMSettings, QPData

    dtr, args, qp = _segment_qp()
    S, kz, ml, p_if, np_ = dtr.S, dtr.kz, dtr.ml, dtr.p_if, dtr.ocp.np_
    # make local row 2 of every segment infeasible against the box:
    # al = au = 10 but |A_row . w| <= ||A_row||_1 * 2 < 10 is impossible
    # only if the row norm is small — instead force an empty box-vs-row gap
    # by requiring row value 100 with w in [-2, 2]
    (Hs, HsP, HPP, gW, gP, A, AP, al, au, lw, uw, lp, up, r_if) = args
    al = al.at[:, 2].set(100.0)
    au = au.at[:, 2].set(100.0)
    args = (Hs, HsP, HPP, gW, gP, A, AP, al, au, lw, uw, lp, up, r_if)
    s = DistSQPSettings(admm_iters=2000, check_every=25, eps_abs=1e-6,
                        eps_rel=1e-6, adaptive_rho=False, rho=0.1)
    out = _dist_admm(dtr, *args,
                     jnp.zeros((S, ml)), jnp.zeros((S - 1, p_if)),
                     jnp.zeros((S, kz)), jnp.zeros(np_), s, None, "seg")
    status = out[7]
    assert int(status) == st.INFEASIBLE, int(status)
    # fused agrees
    n = S * kz
    alf = np.asarray(qp.al).copy()
    auf = np.asarray(qp.au).copy()
    for s_ in range(S):
        alf[s_ * ml + 2] = 100.0
        auf[s_ * ml + 2] = 100.0
    qp2 = QPData(qp.H, qp.h, qp.A, jnp.asarray(alf), jnp.asarray(auf),
                 qp.xl, qp.xu)
    fsol = box_admm_solve(qp2, settings=ADMMSettings(
        rho=0.1, eps_abs=1e-6, eps_rel=1e-6, max_epochs=80,
        check_every=25, polish=False))
    assert int(fsol.status) == st.INFEASIBLE, int(fsol.status)


def test_dist_sqp_surfaces_qp_diagnostics():
    """dist_sqp_solve reports accumulated inner-QP iterations and the last
    QP status (observability parity with SQPSolution.qp_iters)."""
    ocp = parking_ocp()
    x0 = [1.0, 1.0, np.pi / 2]
    dtr = dist_transcribe(ocp, Chebyshev(5), 2, 0.0, 1.0)
    bounds = dist_bounds(dtr, x0=x0, ul=[-1.0, -1.0], uu=[1.0, 1.0],
                         pl=[0.0], pu=[10.0])
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=[1.0])
    P0 = P0.at[0].set(0.5)
    out = dist_sqp_solve(dtr, bounds, W0, P0, d=[1.0],
                         settings=DistSQPSettings(max_iter=40,
                                                  admm_iters=400))
    assert int(out["status"]) == st.SOLVED
    # residual-based early exit: strictly fewer than the cap would spend
    assert 0 < int(out["qp_iters"]) < int(out["iters"]) * 400
    assert int(out["qp_status"]) in (st.SOLVED, st.MAX_ITER_EXCEEDED,
                                     st.INFEASIBLE)


def test_dist_sqp_iteration_trace():
    """trace_iters > 0 records per-iteration (cost, violation, ps, ds)
    rows — the distributed analogue of SQPSolution.trace."""
    ocp = parking_ocp()
    x0 = [1.0, 1.0, np.pi / 2]
    dtr = dist_transcribe(ocp, Chebyshev(5), 2, 0.0, 1.0)
    bounds = dist_bounds(dtr, x0=x0, ul=[-1.0, -1.0], uu=[1.0, 1.0],
                         pl=[0.0], pu=[10.0])
    W0, P0 = dtr.rollout_guess(jnp.asarray(x0, jnp.float64), d=[1.0])
    P0 = P0.at[0].set(0.5)
    out = dist_sqp_solve(dtr, bounds, W0, P0, d=[1.0],
                         settings=DistSQPSettings(max_iter=40,
                                                  admm_iters=400,
                                                  trace_iters=10))
    assert int(out["status"]) == st.SOLVED
    tra = np.asarray(out["trace"])
    assert tra.shape == (10, 4)
    k = int(out["iters"])
    rows = tra[:min(k, 10)]
    assert np.all(np.isfinite(rows)), rows
    # the recorded cost matches the final cost at the last iteration
    np.testing.assert_allclose(rows[min(k, 10) - 1, 0], float(out["cost"]),
                               rtol=1e-8)
    # rows past the final iteration stay NaN
    if k < 10:
        assert np.all(np.isnan(tra[k:]))
