"""Simple kinematic kite ("tricycle on a sphere") benchmark model.

Reference model: examples/kite.cpp:14-75 (SimpleKinematicKite), state
(theta elevation, phi azimuth, gamma heading), control u_gamma; parameters
tether length L=5, gliding ratio E=5, wind speed ws=3, reel speed z=0.
Output map H x = (theta, phi) (kite.cpp:62-65).

The rotation-matrix entries reproduce the reference *as coded* (kite.cpp
assigns R_GN(2,2) twice and implements M[1,1] = cos(theta)/L), because the
benchmark is defined by the code's behaviour; deviations from a textbook
spherical kinematics derivation are deliberate.

Figure-eight path (kite_control_test.cpp:15-29):
    theta_p(s) = pi/6 + 0.2 sin(2 s),  phi_p(s) = 0.8 cos(s).
"""
from __future__ import annotations

import jax.numpy as jnp

from polympc_tpu.ocp.ocp import OCP

__all__ = ["kite_dynamics", "kite_output", "kite_path", "kite_ocp"]


def kite_dynamics(x, u, L: float = 5.0, E: float = 5.0, ws: float = 3.0):
    """xdot for the simple kinematic kite (kite.cpp:30-54)."""
    theta, phi, gamma = x[0], x[1], x[2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    sg, cg = jnp.sin(gamma), jnp.cos(gamma)

    # M = diag(1/L, cos(theta)/L)   (as coded: (1/L * cos(theta)))
    # R_GN rows as coded: row2 = [0, 0, -sin(theta)]
    # qdot2 = M Rb_NK EM R_NK' R_GN' vw, vw = (ws, 0, 0)
    # R_GN' vw = ws * (R_GN[0,:]) = ws * (-st*cp, -st, -ct*cp)
    w = ws * jnp.array([-st * cp, -st, -ct * cp])
    # R_NK' w: R_NK = eye with top-left 2x2 = R(gamma)
    Rnk_t_w = jnp.array([cg * w[0] + sg * w[1],
                         -sg * w[0] + cg * w[1],
                         w[2]])
    # EM @ (.) = (v0 - E*v2, 0)
    e = jnp.array([Rnk_t_w[0] - E * Rnk_t_w[2], 0.0])
    # Rb_NK @ e
    r = jnp.array([cg * e[0] - sg * e[1], sg * e[0] + cg * e[1]])
    # M @ r
    qdot = jnp.array([r[0] / L, r[1] * ct / L])
    return jnp.array([qdot[0], qdot[1], u[0]])


def kite_output(x):
    """Output map H x = (theta, phi) (kite.cpp:62-65)."""
    return x[:2]


def kite_path(s):
    """Lemniscate-like figure on the sphere (kite_control_test.cpp:15-29)."""
    h = jnp.pi / 6.0
    a = 0.2
    return jnp.array([h + a * jnp.sin(2.0 * s), 4.0 * a * jnp.cos(s)])


def kite_ocp(q: float = 1.0, r: float = 0.1) -> OCP:
    """Plain tracking OCP on the kite (for batched-solve benchmarks):
    L = q*||output(x) - ref||^2 + r*u^2, ref passed as static data d."""
    def dynamics(x, u, p, d, t):
        return kite_dynamics(x, u)

    def lagrange(x, u, p, d, t):
        e = kite_output(x) - d[:2]
        return q * (e @ e) + r * (u @ u)

    def mayer(x, p, d):
        e = kite_output(x) - d[:2]
        return q * (e @ e)

    return OCP(dynamics=dynamics, nx=3, nu=1, nd=2,
               lagrange=lagrange, mayer=mayer)
