"""Structured-derivative parity: block-assembled Jacobians/Hessians must match
whole-vector AD (the analogue of the reference's dense_sparse_compare test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.models import robot_ocp, parking_ocp, cstr_ocp
from polympc_tpu.ocp import transcribe


def _check(tr, prm, z, lam, has_ineq=False):
    nlp = tr.nlp
    # eq jacobian
    J_struct = np.asarray(nlp.eq_jac(z, prm))
    J_ad = np.asarray(jax.jacfwd(lambda zz: nlp.eq(zz, prm))(z))
    np.testing.assert_allclose(J_struct, J_ad, atol=1e-9)
    # lagrangian hessian
    H_struct = np.asarray(nlp.lag_hessian(z, lam, prm))
    def lagr(zz):
        val = nlp.cost(zz, prm) + nlp.eq(zz, prm) @ lam[:nlp.ne]
        if has_ineq:
            val = val + nlp.ineq(zz, prm) @ lam[nlp.ne:]
        return val
    H_ad = np.asarray(jax.hessian(lagr)(z))
    np.testing.assert_allclose(H_struct, H_ad, atol=1e-8)
    if has_ineq:
        G_struct = np.asarray(nlp.ineq_jac(z, prm))
        G_ad = np.asarray(jax.jacfwd(lambda zz: nlp.ineq(zz, prm))(z))
        np.testing.assert_allclose(G_struct, G_ad, atol=1e-9)


def test_structured_robot():
    tr = transcribe(robot_ocp(), SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[2.0], t0=0.0, tf=2.0)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=tr.nlp.n) * 0.3)
    lam = jnp.asarray(rng.normal(size=tr.nlp.m))
    _check(tr, prm, z, lam)


def test_structured_parking_with_params_and_ineq():
    # np_=1 (arrow column) and ng=1 (inequality path)
    tr = transcribe(parking_ocp(nonlinear_constraint=True),
                    SegmentedBasis(Chebyshev(5), 2))
    prm = tr.params(d=[1.0], t0=0.0, tf=1.0)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=tr.nlp.n) * 0.3)
    lam = jnp.asarray(rng.normal(size=tr.nlp.m))
    _check(tr, prm, z, lam, has_ineq=True)


def test_structured_cstr_scaled():
    # variable scaling must be reflected in the structured derivatives
    tr = transcribe(cstr_ocp(), SegmentedBasis(Chebyshev(5), 2),
                    x_scale=[2.0, 1.0, 100.0, 100.0], u_scale=[15.0, 2000.0])
    prm = tr.params(t0=0.0, tf=100.0)
    rng = np.random.default_rng(2)
    z = tr.pack(jnp.asarray([[1.0, 0.5, 100.0, 100.0]] * tr.N),
                jnp.asarray([[14.0, -1000.0]] * tr.N))
    z = z + jnp.asarray(rng.normal(size=tr.nlp.n) * 0.01)
    lam = jnp.asarray(rng.normal(size=tr.nlp.m))
    _check(tr, prm, z, lam)
