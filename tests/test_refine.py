"""1e-6 KKT-residual parity: fp32 TPU-config solves + fp64 Newton-KKT
refinement certify the reference's Ipopt accuracy bar
(ipopt_interface.hpp:403 tol 1e-6) — SURVEY.md §7 hard-part #3.

Each model is solved twice:
  * TPU config: fp32, bench.py's relaxed tolerances (eps_stat 1e-2, 3x50
    ADMM epochs, no polish), then refine_solution in fp64;
  * fp64 oracle: tight tolerances end-to-end, also refined (so both sides
    are exact KKT points, not two different approximations).
The refined TPU solution must certify ||KKT||_inf <= 1e-6 and agree with
the refined oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control.nmpf import augment_ocp
from polympc_tpu.models import (
    robot_ocp, parking_ocp, kite_dynamics, kite_output, kite_path,
)
from polympc_tpu.nlp import SQPSettings, sqp_solve
from polympc_tpu.nlp.refine import kkt_residual, refine_solution
from polympc_tpu.ocp import transcribe, ocp_bounds
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

# bench.py's TPU solver configuration (fp32, relaxed)
TPU_SETTINGS = SQPSettings(
    hessian="exact", max_iter=12, reg="mirror",
    eps_prim=1e-3, eps_dual=1e-3, eps_viol=1e-3, eps_stat=1e-2,
    qp=ADMMSettings(rho=1.0, eps_abs=1e-4, eps_rel=1e-4,
                    max_epochs=3, check_every=50, equil_iters=0,
                    polish=False))
ORACLE_SETTINGS = SQPSettings(
    hessian="exact", max_iter=100,
    qp=ADMMSettings(eps_abs=1e-8, eps_rel=1e-8, max_epochs=60))


def _setup_robot():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    x0 = [0.5, 0.5, 0.5]
    mk = lambda dt: (tr.params(d=[2.0], t0=0.0, tf=2.0, dtype=dt),
                     ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75],
                                x0=x0, dtype=dt),
                     tr.initial_guess(x0, dtype=dt))
    return tr, mk


def _setup_parking():
    tr = transcribe(parking_ocp(), SegmentedBasis(Chebyshev(5), 2))
    x0 = [1.5, 0.5, 0.5]
    nxN = tr.N * 3

    def mk(dt):
        prm = tr.params(d=[1.0], t0=0.0, tf=1.0, dtype=dt)
        bounds = ocp_bounds(tr, ul=[-1.5, -0.75], uu=[1.5, 0.75],
                            pl=[0.0], pu=[10.0], x0=x0, dtype=dt)
        bounds = bounds._replace(
            lbx=bounds.lbx.at[nxN - 3:nxN].set(-0.05),
            ubx=bounds.ubx.at[nxN - 3:nxN].set(0.05))
        z0 = tr.initial_guess(x0, dtype=dt).at[-1].set(0.5)
        return prm, bounds, z0
    return tr, mk


def _setup_kite():
    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    tr = transcribe(ocp, SegmentedBasis(Chebyshev(5), 2))
    x0 = [0.6, 0.4, 0.0, 0.0, 0.05]

    def mk(dt):
        prm = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=dt)
        bounds = ocp_bounds(
            tr, ul=[-5.0, -10.0], uu=[5.0, 10.0],
            xl=[0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
            xu=[np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0],
            x0=x0, dtype=dt)
        return prm, bounds, tr.rollout_guess(jnp.asarray(x0, dt), prm)
    return tr, mk


SETUPS = {"robot": _setup_robot, "parking": _setup_parking,
          "kite": _setup_kite}


@pytest.mark.parametrize("name", ["robot", "parking", "kite"])
def test_fp32_plus_refinement_certifies_1e6(name):
    import dataclasses
    tr, mk = SETUPS[name]()
    prm32, bounds32, z032 = mk(jnp.float32)
    # the bench iteration cap (12) and 3-epoch inner QP are tuned for
    # warm/rollout-started kite batches; the cold-started minimum-time
    # problem needs more SQP iterations AND a more accurate inner QP in
    # honest fp32 (transcription keeps the NLP in the requested dtype —
    # with 3 epochs the dual step stalls at ~1.5)
    settings = dataclasses.replace(
        TPU_SETTINGS, max_iter=30 if name == "parking" else 12,
        qp=dataclasses.replace(
            TPU_SETTINGS.qp,
            max_epochs=6 if name == "parking" else 3))
    sol = sqp_solve(tr.nlp, z032, p=prm32, bounds=bounds32,
                    settings=settings)
    assert int(sol.status) == st.SOLVED

    prm64, bounds64, z064 = mk(jnp.float64)
    z, lam, lam_box = refine_solution(tr.nlp, sol.x, sol.lam, sol.lam_box,
                                      bounds32, prm64, iters=2)
    r = kkt_residual(tr.nlp, z, lam, lam_box, bounds64, prm64)
    assert float(r.max) <= 1e-6, (
        f"{name}: refined KKT {float(r.max):.2e} "
        f"(stat {float(r.stationarity):.1e} feas {float(r.feasibility):.1e} "
        f"comp {float(r.complementarity):.1e})")

    # fp64 oracle, also refined to an exact KKT point
    solo = sqp_solve(tr.nlp, z064, p=prm64, bounds=bounds64,
                     settings=ORACLE_SETTINGS)
    assert int(solo.status) == st.SOLVED
    zo, lo, lbo = refine_solution(tr.nlp, solo.x, solo.lam, solo.lam_box,
                                  bounds64, prm64, iters=2)
    ro = kkt_residual(tr.nlp, zo, lo, lbo, bounds64, prm64)
    assert float(ro.max) <= 1e-6
    np.testing.assert_allclose(np.asarray(z), np.asarray(zo), atol=1e-5,
                               err_msg=f"{name}: refined fp32 vs fp64 oracle")


def test_kkt_residual_flags_bad_points():
    tr, mk = _setup_robot()
    prm, bounds, z0 = mk(jnp.float64)
    n, m = tr.nlp.n, tr.nlp.m
    r = kkt_residual(tr.nlp, z0, jnp.zeros(m), jnp.zeros(n), bounds, prm)
    # the unsolved initial guess is nowhere near stationary
    assert float(r.max) > 1e-2


def test_mixed_precision_refinement_f32_solver():
    """The TPU configuration: fp64 residuals + fp32 inner linear solves
    (XLA's TPU LU is fp32-only) — classic iterative refinement; must still
    certify 1e-6."""
    tr, mk = _setup_kite()
    prm32, bounds32, z032 = mk(jnp.float32)
    sol = sqp_solve(tr.nlp, z032, p=prm32, bounds=bounds32,
                    settings=TPU_SETTINGS)
    assert int(sol.status) == st.SOLVED
    prm64, bounds64, _ = mk(jnp.float64)
    z, lam, lam_box = refine_solution(
        tr.nlp, sol.x, sol.lam, sol.lam_box, bounds32, prm64, iters=3,
        solve_dtype=jnp.float32)
    r = kkt_residual(tr.nlp, z, lam, lam_box, bounds64, prm64)
    assert float(r.max) <= 1e-6, float(r.max)


def test_return_last_continuation_matches_single_run():
    """Two-stage refinement (iters=2 then continue 2 more from the LAST
    iterate via return_last) must land on the same Newton path as one
    4-iteration run — the adaptive tail-sweep contract bench.py relies on."""
    tr, mk = _setup_robot()
    prm, bounds, z0 = mk(jnp.float64)
    sol = sqp_solve(tr.nlp, z0, p=prm, bounds=bounds,
                    settings=TPU_SETTINGS)
    one = refine_solution(tr.nlp, sol.x, sol.lam, sol.lam_box, bounds, prm,
                          iters=4, return_residual=True)
    st1 = refine_solution(tr.nlp, sol.x, sol.lam, sol.lam_box, bounds, prm,
                          iters=2, return_residual=True, return_last=True)
    z1, lam1, lamb1, r1, zl, laml, lambl = st1
    st2 = refine_solution(tr.nlp, zl, laml, lambl, bounds, prm,
                          iters=2, return_residual=True)
    r_final = float(jnp.minimum(r1, st2[3]))
    # same certified class; the two paths agree to fp64 Newton noise
    assert r_final <= 1e-6
    assert float(one[3]) <= 1e-6
    np.testing.assert_allclose(np.asarray(st2[0]), np.asarray(one[0]),
                               atol=1e-7)
