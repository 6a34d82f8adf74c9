"""Primal-dual interior-point QP solver (Mehrotra predictor-corrector).

The high-accuracy QP backend: plays the role of the reference's external
solver interfaces (osqp_interface.hpp / qpmad_interface.hpp /
ipopt_interface.hpp) as a native solver — no external library, pure JAX,
fixed-iteration ``lax.while_loop`` (vmap-safe), dense KKT factorisations on
the MXU.

Problem form (same as box_admm):
    min 1/2 x'Hx + h'x   s.t.  al <= Ax <= au,  xl <= x <= xu.

All 2(m+n) one-sided constraints get slacks s >= 0 and duals z >= 0:
    lower rows:  C x - b - s = 0,   C = [A; I] rows, b = [al; xl]
    upper rows:  b - C x - s = 0,   b = [au; xu]
Infinite bounds are masked out (their duals pinned to 0, slacks to 1).

Newton system with the standard elimination of (s, z): for each constraint
row, d = z/s; the condensed system is
    (H + C' diag(d_eff) C) dx = -r
which keeps the KKT at (n x n) — smaller than ADMM's (n+m) — and SPD, solved
by Cholesky.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from polympc_tpu.qp.types import QPData, QPSolution, infer_dims
from polympc_tpu.utils import status as st
from polympc_tpu.utils.precision import full_precision

__all__ = ["IPSettings", "qp_ip_solve"]


@dataclasses.dataclass(frozen=True)
class IPSettings:
    max_iter: int = 30
    eps: float = 1e-8          # KKT residual tolerance
    tau: float = 0.995         # fraction-to-boundary
    reg: float = 1e-9          # Cholesky regularisation
    loose_bound: float = 1e10
    s_init: float = 1.0        # initial slack/dual magnitude


@full_precision
@functools.partial(jax.jit, static_argnames=("settings",))
def qp_ip_solve(qp: QPData, settings: IPSettings = IPSettings()) -> QPSolution:
    n, m = infer_dims(qp)
    dt = qp.H.dtype
    mt = m + n

    C = jnp.concatenate([qp.A, jnp.eye(n, dtype=dt)], axis=0) if m else \
        jnp.eye(n, dtype=dt)
    bl = jnp.concatenate([qp.al, qp.xl]) if m else qp.xl
    bu = jnp.concatenate([qp.au, qp.xu]) if m else qp.xu
    has_l = bl > -settings.loose_bound
    has_u = bu < settings.loose_bound
    fl = has_l.astype(dt)
    fu = has_u.astype(dt)
    bl_s = jnp.where(has_l, bl, 0.0)
    bu_s = jnp.where(has_u, bu, 0.0)

    x = jnp.clip(jnp.zeros(n, dt),
                 jnp.where(has_l[m:], bl_s[m:] + settings.s_init, -1.0),
                 jnp.where(has_u[m:], bu_s[m:] - settings.s_init, 1.0))
    s_l = jnp.full(mt, settings.s_init, dt)
    s_u = jnp.full(mt, settings.s_init, dt)
    z_l = jnp.full(mt, settings.s_init, dt)
    z_u = jnp.full(mt, settings.s_init, dt)

    def residuals(x, s_l, s_u, z_l, z_u):
        Cx = C @ x
        r_dual = qp.H @ x + qp.h + C.T @ (fu * z_u - fl * z_l)
        r_pl = fl * (Cx - bl_s - s_l)          # lower primal
        r_pu = fu * (bu_s - Cx - s_u)          # upper primal
        return r_dual, r_pl, r_pu, Cx

    def kkt_norm(x, s_l, s_u, z_l, z_u):
        r_dual, r_pl, r_pu, _ = residuals(x, s_l, s_u, z_l, z_u)
        comp = jnp.maximum(jnp.max(fl * s_l * z_l, initial=0.0),
                           jnp.max(fu * s_u * z_u, initial=0.0))
        return jnp.maximum(
            jnp.max(jnp.abs(r_dual), initial=0.0),
            jnp.maximum(jnp.max(jnp.abs(r_pl), initial=0.0),
                        jnp.maximum(jnp.max(jnp.abs(r_pu), initial=0.0),
                                    comp)))

    n_active = jnp.maximum(jnp.sum(fl) + jnp.sum(fu), 1.0)

    def newton_step(x, s_l, s_u, z_l, z_u, sigma_mu):
        """One condensed Newton solve for target barrier sigma_mu."""
        r_dual, r_pl, r_pu, Cx = residuals(x, s_l, s_u, z_l, z_u)
        d_l = fl * z_l / jnp.maximum(s_l, 1e-12)
        d_u = fu * z_u / jnp.maximum(s_u, 1e-12)
        # rhs assembling the eliminated slack/dual equations:
        #   ds_l = C dx - (-r_pl) ... complementarity: Z ds + S dz = sigma_mu - s*z
        rc_l = (sigma_mu - s_l * z_l) / jnp.maximum(s_l, 1e-12)
        rc_u = (sigma_mu - s_u * z_u) / jnp.maximum(s_u, 1e-12)
        # from eliminating ds, dz:  (H + C'(d_l+d_u)C) dx =
        #   -r_dual + C'[(rc_l - d_l r_pl) - (rc_u - d_u r_pu)]
        w = (fl * (rc_l - d_l * r_pl)) - (fu * (rc_u - d_u * r_pu))
        rhs = -(r_dual) + C.T @ w
        K = qp.H + (C.T * (d_l + d_u)) @ C \
            + settings.reg * jnp.eye(n, dtype=dt)
        fac = cho_factor(K)
        dx = cho_solve(fac, rhs)
        Cdx = C @ dx
        ds_l = Cdx + r_pl
        ds_u = -Cdx + r_pu
        dz_l = rc_l - d_l * ds_l
        dz_u = rc_u - d_u * ds_u
        return dx, ds_l, ds_u, dz_l, dz_u

    def max_alpha(v, dv, mask):
        """Largest alpha in (0, 1] keeping v + alpha dv >= (1-tau) v."""
        ratio = jnp.where((dv < 0) & (mask > 0),
                          -settings.tau * v / jnp.where(dv < 0, dv, -1.0),
                          jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, initial=1.0))

    def body(carry):
        x, s_l, s_u, z_l, z_u, it, done = carry
        mu = (jnp.sum(fl * s_l * z_l) + jnp.sum(fu * s_u * z_u)) / n_active

        # predictor (affine) step
        dxa, dsla, dsua, dzla, dzua = newton_step(x, s_l, s_u, z_l, z_u, 0.0)
        a_p = jnp.minimum(max_alpha(s_l, dsla, fl), max_alpha(s_u, dsua, fu))
        a_d = jnp.minimum(max_alpha(z_l, dzla, fl), max_alpha(z_u, dzua, fu))
        mu_aff = (jnp.sum(fl * (s_l + a_p * dsla) * (z_l + a_d * dzla))
                  + jnp.sum(fu * (s_u + a_p * dsua) * (z_u + a_d * dzua))) \
            / n_active
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-14)) ** 3, 0.0, 1.0)

        # corrector step toward sigma*mu
        dx, ds_l, ds_u, dz_l, dz_u = newton_step(
            x, s_l, s_u, z_l, z_u, sigma * mu)
        a_p = jnp.minimum(max_alpha(s_l, ds_l, fl), max_alpha(s_u, ds_u, fu))
        a_d = jnp.minimum(max_alpha(z_l, dz_l, fl), max_alpha(z_u, dz_u, fu))

        x2 = x + a_p * dx
        s_l2 = jnp.where(has_l, s_l + a_p * ds_l, 1.0)
        s_u2 = jnp.where(has_u, s_u + a_p * ds_u, 1.0)
        z_l2 = jnp.where(has_l, z_l + a_d * dz_l, 0.0)
        z_u2 = jnp.where(has_u, z_u + a_d * dz_u, 0.0)

        conv = kkt_norm(x2, s_l2, s_u2, z_l2, z_u2) <= settings.eps
        finite = jnp.all(jnp.isfinite(x2))
        x2 = jnp.where(finite, x2, x)
        new = (x2, s_l2, s_u2, z_l2, z_u2, it + 1, conv | ~finite)
        old = (x, s_l, s_u, z_l, z_u, it, done)
        return tuple(jnp.where(done, o, nn) for o, nn in zip(old, new))

    def cond(carry):
        it, done = carry[5], carry[6]
        return (~done) & (it < settings.max_iter)

    init = (x, s_l, s_u, z_l, z_u, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool))
    x, s_l, s_u, z_l, z_u, iters, done = jax.lax.while_loop(cond, body, init)

    res = kkt_norm(x, s_l, s_u, z_l, z_u)
    status = jnp.where(res <= 10 * settings.eps, st.SOLVED,
                       jnp.where(done, st.UNSOLVED,
                                 st.MAX_ITER_EXCEEDED)).astype(jnp.int32)
    # net duals: y = z_u - z_l per row; split general/box
    y_all = fu * z_u - fl * z_l
    y = y_all[:m]
    y_box = y_all[m:]
    r_dual, r_pl, r_pu, _ = residuals(x, s_l, s_u, z_l, z_u)
    return QPSolution(
        x=x, y=y, y_box=y_box, status=status, iters=iters,
        res_prim=jnp.maximum(jnp.max(jnp.abs(r_pl), initial=0.0),
                             jnp.max(jnp.abs(r_pu), initial=0.0)),
        res_dual=jnp.max(jnp.abs(r_dual), initial=0.0),
        rho=jnp.zeros(m, dt))
