"""Parameter identification (CollocateIdCost / kite-identification
capability, chebyshev.hpp:426+, examples/kite_identification_test.cpp).

Oracles: synthetic data from known parameters must be recovered —
equation-error exactly (noise-free, dynamics affine in p), output-error
refinement to the collocation tolerance, and robustly under measurement
noise.  Includes a forced (non-autonomous) system.
"""
import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.basis.splines import fit_cubic_spline
from polympc_tpu.ocp.identification import equation_error_fit, identify
from polympc_tpu.ocp.integrators import rk4_integrate
from polympc_tpu.utils import status as st

P_TRUE = jnp.array([4.0, 0.3])
T = 3.0


def _pendulum(x, u, p, d, t):
    return jnp.array([x[1], -p[0] * jnp.sin(x[0]) - p[1] * x[1]])


def _make_data(noise=0.0, seed=0):
    f = lambda x, u, t: _pendulum(x, None, P_TRUE, None, t)
    xs = rk4_integrate(f, jnp.array([1.0, 0.0]), 0.0, T, 300)
    xs = np.asarray(xs)
    if noise:
        rng = np.random.default_rng(seed)
        xs = xs + rng.normal(0.0, noise, xs.shape)
    ts = np.linspace(0.0, T, xs.shape[0])
    h = ts[1] - ts[0]
    sp0 = fit_cubic_spline(0.0, h, xs[:, 0])
    sp1 = fit_cubic_spline(0.0, h, xs[:, 1])
    return lambda t: jnp.stack([sp0(t), sp1(t)])


def test_equation_error_exact_recovery():
    xdata = _make_data()
    mesh = SegmentedBasis(Chebyshev(5), 6)
    t_nodes = jnp.asarray(mesh.time_nodes(0.0, T))
    X = jax.vmap(xdata)(t_nodes)
    U = jnp.zeros((X.shape[0], 0))
    p, rms = equation_error_fit(_pendulum, mesh, X, U, 0.0, T,
                                jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(p), np.asarray(P_TRUE), atol=1e-3)
    assert float(rms) < 1e-3


def test_output_error_identify_noise_free():
    xdata = _make_data()
    res = identify(_pendulum, SegmentedBasis(Chebyshev(5), 6), xdata, None,
                   0.0, T, n_params=2, nx=2, p0=[1.0, 1.0],
                   pl=[0.1, 0.0], pu=[20.0, 5.0])
    assert int(res.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(res.p), np.asarray(P_TRUE),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.p_init), np.asarray(P_TRUE),
                               atol=1e-3)


def test_output_error_identify_noisy():
    xdata = _make_data(noise=2e-3, seed=1)
    res = identify(_pendulum, SegmentedBasis(Chebyshev(5), 6), xdata, None,
                   0.0, T, n_params=2, nx=2, p0=[1.0, 1.0],
                   pl=[0.1, 0.0], pu=[20.0, 5.0])
    assert int(res.status) == st.SOLVED
    # output-error refinement should land within a few percent under noise
    np.testing.assert_allclose(np.asarray(res.p), np.asarray(P_TRUE),
                               rtol=0.1, atol=0.05)


def test_forced_system_identification():
    # first-order forced system: xdot = -p0 x + p1 u(t)
    p_true = jnp.array([1.5, 2.0])

    def dyn(x, u, p, d, t):
        return jnp.array([-p[0] * x[0] + p[1] * u[0]])

    u_fn = lambda t: jnp.array([jnp.sin(2.0 * t)])
    f = lambda x, u, t: dyn(x, u_fn(t), p_true, None, t)
    xs = np.asarray(rk4_integrate(f, jnp.array([0.5]), 0.0, 4.0, 400))
    ts = np.linspace(0.0, 4.0, xs.shape[0])
    sp = fit_cubic_spline(0.0, ts[1] - ts[0], xs[:, 0])
    xdata = lambda t: jnp.stack([sp(t)])
    res = identify(dyn, SegmentedBasis(Chebyshev(5), 4), xdata, u_fn,
                   0.0, 4.0, n_params=2, nx=1, nu=0,
                   p0=[1.0, 1.0], pl=[0.01, 0.01], pu=[10.0, 10.0])
    assert int(res.status) == st.SOLVED
    np.testing.assert_allclose(np.asarray(res.p), np.asarray(p_true),
                               atol=2e-3)
