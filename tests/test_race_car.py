"""Race-car model + path toolchain tests (SURVEY.md §8.5).

Covers: Pacejka tyre sanity, curvilinear/Cartesian dynamics consistency,
the spline-fitting QP (vs direct least squares), the frame-transform NLP
(projection + curvilinear coordinates round trip), and a path-following
NMPC solve on a wavy track (the reference's headline benchmark problem,
docs/source/applications.rst:270-641).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control import (
    MPC, PathFrame, fit_spline_qp, frame_transform, project_on_path,
    track_from_curvature,
)
from polympc_tpu.models import (
    CarParams, car_body_accels, car_dynamics_cartesian,
    car_dynamics_curvilinear, car_dynamics_rate_augmented, lateral_forces,
    make_wave_track, race_car_ocp,
)
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

P = CarParams()


def test_pacejka_slip_sanity():
    # at zero slip: zero lateral force; small slip: force ~ linear, sign +
    Fyf, Fyr, af, ar = lateral_forces(P, 10.0, 0.0, 0.0, 0.0)
    assert abs(float(af)) < 1e-3 and abs(float(ar)) < 1e-3
    assert abs(float(Fyf)) < 50.0 and abs(float(Fyr)) < 50.0
    # steering left at speed -> positive front slip -> positive front force
    Fyf1, _, af1, _ = lateral_forces(P, 10.0, 0.0, 0.0, 0.1)
    assert float(af1) > 0.0 and float(Fyf1) > 0.0
    # saturation: force bounded by Fz * D
    Fzf = P.m * P.g * P.Lr / (P.Lf + P.Lr)
    Fyf2, _, _, _ = lateral_forces(P, 10.0, -5.0, 0.0, 0.5)
    assert abs(float(Fyf2)) <= Fzf * P.Df + 1e-6


def test_straight_line_invariance():
    # no steering, no lateral velocity, zero curvature: vy/omega/w/theta
    # stay zero and s_dot = vx
    kappa = lambda s: 0.0 * s
    x = jnp.array([15.0, 0.0, 0.0, 3.0, 0.0, 0.0])
    u = jnp.array([0.0, 200.0, 200.0])
    xdot = car_dynamics_curvilinear(x, u, kappa, P)
    assert abs(float(xdot[1])) < 1e-8   # vy_dot
    assert abs(float(xdot[2])) < 1e-8   # omega_dot
    assert abs(float(xdot[4])) < 1e-8   # w_dot
    assert abs(float(xdot[5])) < 1e-8   # theta_dot
    np.testing.assert_allclose(float(xdot[3]), 15.0, rtol=1e-12)  # s_dot


def test_cartesian_curvilinear_consistency():
    # body accelerations identical in both frames
    x_cart = jnp.array([12.0, 0.5, 0.2, 1.0, 2.0, 0.3])
    x_curv = jnp.array([12.0, 0.5, 0.2, 5.0, 0.1, 0.05])
    u = jnp.array([0.05, 300.0, 250.0])
    kappa = lambda s: 0.01 + 0.0 * s
    d_cart = car_dynamics_cartesian(x_cart, u, P)
    d_curv = car_dynamics_curvilinear(x_curv, u, kappa, P)
    np.testing.assert_allclose(np.asarray(d_cart[:3]),
                               np.asarray(d_curv[:3]), rtol=1e-12)


def test_rate_augmented_consistency():
    # augmented dynamics with delta_d == delta reproduce the base model
    x6 = jnp.array([12.0, 0.5, 0.2, 5.0, 0.1, 0.05])
    delta, Fxf, Fxr = 0.05, 300.0, 250.0
    kappa = lambda s: 0.01 + 0.0 * s
    xi = jnp.concatenate([x6, jnp.array([delta, delta, Fxf, Fxr])])
    v = jnp.array([0.1, 10.0, -10.0])
    dxi = car_dynamics_rate_augmented(xi, v, kappa, P, Td=0.05)
    base = car_dynamics_curvilinear(x6, jnp.array([delta, Fxf, Fxr]),
                                    kappa, P)
    np.testing.assert_allclose(np.asarray(dxi[:6]), np.asarray(base),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dxi[6:]),
                               [0.1, 0.0, 10.0, -10.0], atol=1e-12)


def test_spline_fit_qp_matches_lstsq():
    # the ADMM-solved constrained LS QP must reproduce the data to spline
    # accuracy (the reference's "spline fitting" benchmark workload)
    s = np.linspace(0.0, 10.0, 81)
    y = np.sin(0.7 * s) + 0.1 * s
    sp = fit_spline_qp(s, y, n_segments=8)
    y_hat = np.asarray(jax.vmap(sp)(jnp.asarray(s)))
    assert np.sqrt(np.mean((y_hat - y) ** 2)) < 2e-3
    # continuity at an interior knot
    eps = 1e-6
    knot = sp.x0 + 3 * sp.h
    assert abs(float(sp(knot - eps)) - float(sp(knot + eps))) < 1e-4


@pytest.fixture(scope="module")
def wave_path():
    kappa = make_wave_track(length=200.0, amplitude=0.02, waves=3)
    return track_from_curvature(kappa, s_max=200.0)


def test_frame_transform_roundtrip(wave_path):
    path = wave_path
    # take a point ON the path: w = 0, theta = 0, s recovered
    s_true = 57.3
    Xc = float(path.Xc(s_true))
    Yc = float(path.Yc(s_true))
    psic = float(path.psi_c(s_true))
    s, w, theta = frame_transform(path, Xc, Yc, psic)
    assert abs(float(s) - s_true) < 1e-2
    assert abs(float(w)) < 1e-4
    assert abs(float(theta)) < 1e-3
    # a point offset laterally by +0.5 (left): w = +0.5, same s
    Xo = Xc - 0.5 * np.sin(psic)
    Yo = Yc + 0.5 * np.cos(psic)
    s2, w2, th2 = frame_transform(path, Xo, Yo, psic + 0.1)
    assert abs(float(s2) - s_true) < 5e-2
    assert abs(float(w2) - 0.5) < 1e-3
    assert abs(float(th2) - 0.1) < 1e-2


def test_project_on_path_converges(wave_path):
    path = wave_path
    pt = jnp.asarray([float(path.Xc(120.0)), float(path.Yc(120.0))])
    s, sol = project_on_path(path, pt)
    assert int(sol.status) == st.SOLVED
    assert abs(float(s) - 120.0) < 1e-2


def test_project_newton_matches_sqp(wave_path):
    """The fused projected-Newton projection (the latency-class solver the
    headline bench times) agrees with the dense-SQP formulation — the SQP is
    the accuracy oracle (VERDICT r4 task 1a)."""
    from polympc_tpu.control.path import project_on_path_newton
    path = wave_path
    for s_true, ds0 in [(120.0, -0.8), (5.0, 0.5), (195.0, -0.3)]:
        pt = jnp.asarray([float(path.Xc(s_true)), float(path.Yc(s_true))])
        s_sqp, sol = project_on_path(path, pt, s0=s_true + ds0)
        assert int(sol.status) == st.SOLVED
        # warm-started (previous-s) and cold (grid-seeded) Newton
        s_warm = project_on_path_newton(path, pt, s0=s_true + ds0)
        s_cold = project_on_path_newton(path, pt)
        assert abs(float(s_warm) - float(s_sqp)) < 1e-4
        assert abs(float(s_cold) - float(s_sqp)) < 1e-4
    # active-bound case: a point behind the start line projects to s = 0
    pt0 = jnp.asarray([float(path.Xc(0.0)) - 1.0, float(path.Yc(0.0))])
    s_b = project_on_path_newton(path, pt0)
    assert abs(float(s_b)) < 1e-6


def test_race_car_nmpc_solve():
    """Path-following NMPC on the wavy track: the headline benchmark OCP
    (applications.rst:625 "OCP 6.21 ms").  SOLVED + warm-start re-solve."""
    kappa = make_wave_track(length=200.0, amplitude=0.02, waves=3)
    ocp = race_car_ocp(kappa)
    settings = SQPSettings(
        hessian="exact", max_iter=60,
        qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6,
                        max_epochs=40, equil_iters=4))
    mpc = MPC(ocp, SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=2.0,
              settings=settings,
              x_scale=[10.0, 1.0, 1.0, 30.0, 1.0, 1.0],
              u_scale=[0.4, 1e4, 1e4])
    mpc.set_static_parameters([15.0])          # vx_ref
    mpc.control_bounds([-0.4, -2e4, -2e4], [0.4, 2e4, 2e4])
    mpc.state_bounds([1.0, -5.0, -3.0, 0.0, -2.0, -1.0],
                     [40.0, 5.0, 3.0, 1e3, 2.0, 1.0])
    x0 = np.array([10.0, 0.0, 0.0, 0.0, 0.4, 0.05])
    mpc.initial_conditions(x0)
    mpc.x_guess(x0)
    sol = mpc.solve()
    assert int(sol.status) == st.SOLVED
    X = np.asarray(mpc.solution_x())
    # forward progress and corridor containment
    assert np.all(np.diff(X[:, 3]) > 0.0)
    assert np.all(np.abs(X[:, 4]) <= 2.0 + 1e-6)
    # lateral deviation shrinks towards the horizon end
    assert abs(X[-1, 4]) < abs(X[0, 4])

    # warm-started re-solve from a perturbed state: SOLVED, fewer/equal iters
    x1 = x0 + np.array([0.2, 0.01, 0.0, 0.5, -0.02, 0.0])
    mpc.initial_conditions(x1)
    sol2 = mpc.solve()
    assert int(sol2.status) == st.SOLVED
    assert int(sol2.iters) <= int(sol.iters)


def test_race_car_rate_augmented_transcribes():
    """Rate-augmented variant (NX=10): transcription + a few SQP iterations
    reduce the KKT residual (applications.rst:520-575)."""
    kappa = make_wave_track(length=200.0, amplitude=0.015, waves=2)
    ocp = race_car_ocp(kappa, rate_augmented=True)
    settings = SQPSettings(
        hessian="exact", max_iter=40,
        qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6, max_epochs=30,
                        equil_iters=4))
    mpc = MPC(ocp, SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=2.0,
              settings=settings,
              x_scale=[10.0, 1.0, 1.0, 30.0, 1.0, 1.0, 0.4, 0.4, 1e4, 1e4],
              u_scale=[2.0, 1e4, 1e4])
    mpc.set_static_parameters([12.0])
    mpc.control_bounds([-2.0, -1e5, -1e5], [2.0, 1e5, 1e5])
    mpc.state_bounds(
        [1.0, -5.0, -3.0, 0.0, -2.0, -1.0, -0.4, -0.4, -2e4, -2e4],
        [40.0, 5.0, 3.0, 1e3, 2.0, 1.0, 0.4, 0.4, 2e4, 2e4])
    x0 = np.array([10.0, 0.0, 0.0, 0.0, 0.3, 0.0,
                   0.0, 0.0, 500.0, 500.0])
    mpc.initial_conditions(x0)
    mpc.x_guess(x0)
    sol = mpc.solve()
    assert int(sol.status) == st.SOLVED
    X = np.asarray(mpc.solution_x())
    assert np.all(np.diff(X[:, 3]) > 0.0)
