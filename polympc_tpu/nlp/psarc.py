"""Pseudo-arc-length continuation (PSARC) for hard root-finding problems.

TPU-native build of the reference's experimental ``symbolic_psarc``
(src/experimental/psarc.hpp:153-372).  Given equalities F(x) = 0 and a guess
x0, build the convex homotopy (psarc.hpp:173)

    H(x, lam) = lam * (x - x0) + (1 - lam) * F(x)

whose solution path runs from the trivial root (x0, lam=1) to a root of F at
lam = 0, and trace it with a predictor-corrector scheme:

  * tangent: solve  H_x r = -H_lam,  t = l_dot * [r; 1] with
    l_dot = 1/sqrt(1 + r'r), oriented to keep moving the same way along the
    path (first step: lam decreasing) (psarc.hpp:260-302);
  * predictor: z_next = z + h * t;
  * corrector: the projection NLP  min_z 1/2||z - z_pred||^2  s.t. H(z) = 0
    (psarc.hpp:189-196), solved with the SQP stack (the reference calls
    Ipopt); warm-started from the previous solution;
  * when lam crosses 0, pin lam = 0 and re-correct (psarc.hpp:320-327).

The tangent solve and the corrector are jitted (static shapes); the
continuation loop itself is host-side Python — it is inherently sequential
and a handful of iterations long.  Improvements over the reference: adaptive
step length (grow on easy correctors, shrink on failures) instead of the
fixed h = 1, and gradient rescaling kept (psarc.hpp:267-272).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.types import NLP, NLPBounds, SQPSettings
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st

__all__ = ["PsarcSettings", "PsarcResult", "psarc_solve"]


@dataclasses.dataclass(frozen=True)
class PsarcSettings:
    h0: float = 1.0              # initial arc step
    h_min: float = 1e-4
    h_max: float = 10.0
    grow: float = 1.5
    shrink: float = 0.5
    max_steps: int = 100
    tangent_clip: float = 20.0   # inf-norm rescaling threshold (psarc.hpp:267)
    corrector: SQPSettings | None = None


class PsarcResult(NamedTuple):
    x: jnp.ndarray           # root of F
    converged: bool
    steps: int
    lambda_log: np.ndarray   # continuation path of lam


def psarc_solve(F: Callable, x0, settings: PsarcSettings = PsarcSettings(),
                lbx=None, ubx=None) -> PsarcResult:
    """Find a root of F: R^n -> R^n starting from x0 by arc-length
    continuation.  lbx/ubx optionally bound x during correction (the
    reference pins selected components the same way, psarc.hpp:206-216)."""
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    dt = x0.dtype

    def H(z, x0_):
        x, lam = z[:n], z[n]
        return lam * (x - x0_) + (1.0 - lam) * F(x)

    Hjac = jax.jit(jax.jacfwd(H))

    @jax.jit
    def tangent(z, x0_, t_prev, first):
        J = Hjac(z, x0_)            # (n, n+1)
        Hx, Hl = J[:, :n], J[:, n]
        r = jnp.linalg.solve(Hx, -Hl)
        nrm = jnp.max(jnp.abs(r))
        r = jnp.where(nrm > settings.tangent_clip,
                      r * (settings.tangent_clip / nrm), r)
        l_dot = 1.0 / jnp.sqrt(1.0 + r @ r)
        tau = jnp.concatenate([l_dot * r, l_dot[None]])
        # orientation: first step decreases lam; afterwards keep t't_prev > 0
        flip_first = jnp.where(first, -1.0, 1.0)
        proj = t_prev @ tau
        flip_cont = jnp.where(first | (proj >= 0), 1.0, -1.0)
        return tau * flip_first * flip_cont

    # corrector NLP: min 1/2||z - w||^2 s.t. H(z) = 0 (z = (x, lam))
    nlp = NLP(
        cost=lambda z, p: 0.5 * jnp.sum((z - p["w"]) ** 2),
        n=n + 1,
        eq=lambda z, p: H(z, p["x0"]),
        ne=n)
    corr_settings = settings.corrector or SQPSettings(
        hessian="exact", max_iter=30,
        qp=ADMMSettings(rho=1.0, eps_abs=1e-8, eps_rel=1e-8, max_epochs=30,
                        equil_iters=2))
    big = jnp.inf
    lbx_full = jnp.full(n, -big, dt) if lbx is None else jnp.asarray(lbx, dt)
    ubx_full = jnp.full(n, big, dt) if ubx is None else jnp.asarray(ubx, dt)

    @jax.jit
    def correct(w, z_init, lam_lb, lam_ub):
        bounds = NLPBounds(
            lbx=jnp.concatenate([lbx_full, lam_lb[None]]),
            ubx=jnp.concatenate([ubx_full, lam_ub[None]]),
            gl=jnp.zeros(0, dt), gu=jnp.zeros(0, dt))
        return sqp_solve(nlp, z_init, p={"w": w, "x0": x0}, bounds=bounds,
                         settings=corr_settings)

    # initial solve at lam = 1 (trivial root)
    z = jnp.concatenate([x0, jnp.ones(1, dt)])
    one = jnp.ones((), dt)
    sol = correct(z, z, one, one)
    z = sol.x
    t_prev = jnp.zeros(n + 1, dt)
    h = settings.h0
    lam_log = [1.0]
    free_lo = jnp.asarray(-jnp.inf, dt)
    free_hi = jnp.asarray(jnp.inf, dt)
    zero = jnp.zeros((), dt)

    steps = 0
    first = True
    while steps < settings.max_steps:
        steps += 1
        tau = tangent(z, x0, t_prev, jnp.asarray(first))
        z_pred = z + h * tau
        sol = correct(z_pred, z, free_lo, free_hi)
        ok = int(sol.status) == st.SOLVED
        if not ok and h > settings.h_min:
            h = max(settings.h_min, h * settings.shrink)
            continue
        t_prev = tau
        first = False
        z = sol.x
        lam = float(z[n])
        lam_log.append(lam)
        h = min(settings.h_max, h * settings.grow)
        if lam < 0.0:
            # crossed the target: pin lam = 0 and refine (psarc.hpp:320-327)
            z = z.at[n].set(0.0)
            sol = correct(z, z, zero, zero)
            z = sol.x
            lam_log.append(0.0)
            return PsarcResult(x=z[:n], converged=int(sol.status) == st.SOLVED,
                               steps=steps, lambda_log=np.asarray(lam_log))
        if lam < 1e-10:
            return PsarcResult(x=z[:n], converged=True, steps=steps,
                               lambda_log=np.asarray(lam_log))
    return PsarcResult(x=z[:n], converged=False, steps=steps,
                       lambda_log=np.asarray(lam_log))
