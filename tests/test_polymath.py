"""polymath utilities: quaternions, heaviside, linear-system analysis,
solver utils, RBF autodiff showcase (ref: src/polymath.h:25-341,
src/solvers/utils.hpp, src/autodiff/rbf_kernel.hpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.utils import (
    LinearSystem, controllability_matrix, deg2rad, heaviside, is_psd,
    observability_matrix, quat_inverse, quat_multiply, quat_transform,
    rbf_grad, rbf_hessian, rbf_kernel, rk4_step_fn, t1_quat, t2_quat,
    t3_quat,
)


def _rotmat_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def test_quat_identity_and_inverse():
    q = t3_quat(jnp.asarray(0.7))
    qi = quat_inverse(q)
    prod = quat_multiply(q, qi)
    np.testing.assert_allclose(np.asarray(prod), [1.0, 0.0, 0.0, 0.0],
                               atol=1e-12)


def test_quat_transform_matches_rotation_matrix():
    # T3quat(a) encodes the frame transform by angle a about z (the
    # reference's -a/2 convention, polymath.cpp:20-22): rotating a vector
    # with it must match the z-axis DCM.
    a = 0.6
    v = jnp.asarray([1.0, 2.0, 3.0])
    got = np.asarray(quat_transform(t3_quat(jnp.asarray(a)), v))
    want = _rotmat_z(a) @ np.asarray(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_multiply_composition():
    # sequential frame transforms compose by quaternion product
    a, b = 0.3, 0.9
    v = jnp.asarray([0.2, -1.0, 0.5])
    q = quat_multiply(t3_quat(jnp.asarray(a)), t3_quat(jnp.asarray(b)))
    got = np.asarray(quat_transform(q, v))
    want = _rotmat_z(a + b) @ np.asarray(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_heaviside_and_deg2rad():
    assert abs(float(heaviside(jnp.asarray(0.0), 2.0)) - 1.0) < 1e-12
    assert float(heaviside(jnp.asarray(10.0), 2.0)) > 1.999
    assert float(heaviside(jnp.asarray(-10.0), 2.0)) < 1e-3
    np.testing.assert_allclose(float(deg2rad(180.0)), np.pi)


def test_rk4_step_fn_linear_exactness():
    # xdot = -x: RK4 matches exp(-h) to O(h^5)
    f = lambda x, u: -x
    step = rk4_step_fn(f, 0.01)
    x = jnp.asarray([1.0])
    got = float(step(x, jnp.zeros(1))[0])
    assert abs(got - np.exp(-0.01)) < 1e-11


def test_controllability():
    # double integrator: controllable from force input
    F = np.array([[0.0, 1.0], [0.0, 0.0]])
    G = np.array([[0.0], [1.0]])
    H = np.array([[1.0, 0.0]])
    sys = LinearSystem(F, G, H)
    assert sys.is_controllable()
    assert sys.is_observable()
    assert sys.is_stabilizable()
    C = np.asarray(controllability_matrix(F, G))
    assert C.shape == (2, 2) and np.linalg.matrix_rank(C) == 2


def test_uncontrollable_but_stabilizable():
    # decoupled stable mode is uncontrollable but stabilizable
    F = np.array([[-1.0, 0.0], [0.0, 2.0]])
    G = np.array([[0.0], [1.0]])
    sys = LinearSystem(F, G)
    assert not sys.is_controllable()
    assert sys.is_stabilizable()
    # flip: unstable mode uncontrollable -> not stabilizable
    G2 = np.array([[1.0], [0.0]])
    assert not LinearSystem(F, G2).is_stabilizable()


def test_unobservable_detected():
    F = np.array([[-1.0, 0.0], [0.0, -2.0]])
    H = np.array([[1.0, 0.0]])
    sys = LinearSystem(F, np.eye(2), H)
    assert not sys.is_observable()
    O = np.asarray(observability_matrix(F, H))
    assert np.linalg.matrix_rank(O) == 1


def test_is_psd():
    assert is_psd(np.eye(3))
    assert not is_psd(np.diag([1.0, -0.1]))


def test_rbf_derivatives_vs_closed_form():
    x = jnp.asarray([0.5, -0.3])
    c = jnp.asarray([0.1, 0.2])
    gamma = 0.7
    d = np.asarray(x - c)
    k = float(rbf_kernel(x, c, gamma))
    np.testing.assert_allclose(k, np.exp(-gamma * d @ d), rtol=1e-12)
    g = np.asarray(rbf_grad(x, c, gamma))
    np.testing.assert_allclose(g, -2 * gamma * d * k, rtol=1e-12)
    Hm = np.asarray(rbf_hessian(x, c, gamma))
    want = (-2 * gamma * np.eye(2) + 4 * gamma ** 2 * np.outer(d, d)) * k
    np.testing.assert_allclose(Hm, want, rtol=1e-10)
