"""User-facing MPC facade: bounds/IC/warm-start management + interpolation.

TPU-native re-design of ``MPC<OCP, Solver>`` (mpc_wrapper.hpp:18-300).  The
wrapper is a thin *stateful* convenience layer over the pure jitted solve:
it stores bounds/guesses/static parameters as arrays, compiles one pure
solve function, and re-solves with warm starting (``solve()`` keeps primal
and dual state between calls, the analogue of mpc_wrapper.hpp:190-205 +
sqp_base.hpp:613-615).

The reference pins the initial condition at the *tail* of the state block
because of its reversed node ordering (mpc_wrapper.hpp:89-99); here node 0
is t0, so the IC pins node 0.

For batch/vmap use, bypass this facade and call ``sqp_solve`` on the
transcription directly (see polympc_tpu/batch.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import Chebyshev, SegmentedBasis
from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.ip import IPNLPSettings, nlp_ip_solve
from polympc_tpu.nlp.types import NLPBounds, SQPSettings
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.ocp.transcription import transcribe, split_z, pack_z
from polympc_tpu.utils import status as st

__all__ = ["MPC"]


class MPC:
    def __init__(self, ocp: OCP, mesh: SegmentedBasis | None = None,
                 t0: float = 0.0, tf: float = 1.0,
                 settings: SQPSettings | IPNLPSettings =
                 SQPSettings(hessian="exact"),
                 x_scale=None, u_scale=None, p_scale=None,
                 dtype=jnp.float64, solver: str = "sqp"):
        """solver: "sqp" (SQP + boxADMM, the reference's MPC default) or
        "ip" (interior point, the reference's Ipopt-backed path,
        ipopt_interface.hpp:387-495)."""
        if solver not in ("sqp", "ip"):
            raise ValueError("solver must be 'sqp' or 'ip'")
        # settings/solver consistency: only substitute defaults when the
        # caller left the default SQPSettings; explicitly tuned settings of
        # the wrong type are an error, not silently discarded
        if solver == "ip" and not isinstance(settings, IPNLPSettings):
            if settings == SQPSettings(hessian="exact"):
                settings = IPNLPSettings()
            else:
                raise TypeError(
                    "solver='ip' requires IPNLPSettings; got explicitly "
                    f"configured {type(settings).__name__}")
        if solver == "sqp" and not isinstance(settings, SQPSettings):
            raise TypeError(
                "solver='sqp' requires SQPSettings; got "
                f"{type(settings).__name__}")
        self.ocp = ocp
        self.mesh = mesh if mesh is not None else SegmentedBasis(Chebyshev(5), 2)
        self.tr = transcribe(ocp, self.mesh, x_scale=x_scale,
                             u_scale=u_scale, p_scale=p_scale)
        self.settings = settings
        self.dtype = dtype
        N, nx, nu, np_ = self.tr.N, ocp.nx, ocp.nu, ocp.np_
        inf = np.inf
        # per-node trajectory bounds (mpc_wrapper.hpp:103-181)
        self._Xl = jnp.full((N, nx), -inf, dtype)
        self._Xu = jnp.full((N, nx), inf, dtype)
        self._Ul = jnp.full((N, nu), -inf, dtype)
        self._Uu = jnp.full((N, nu), inf, dtype)
        self._pl = jnp.full((np_,), -inf, dtype)
        self._pu = jnp.full((np_,), inf, dtype)
        self._gl = jnp.full((ocp.ng,), -inf, dtype)
        self._gu = jnp.full((ocp.ng,), inf, dtype)
        self._x0 = None
        self._x0_relax = None
        self._d = jnp.zeros((ocp.nd,), dtype)
        self._t0 = jnp.asarray(t0, dtype)
        self._tf = jnp.asarray(tf, dtype)
        self._z = self.tr.initial_guess(dtype=dtype)
        self._lam = jnp.zeros(self.tr.nlp.m, dtype)
        self._lam_box = jnp.zeros(self.tr.nlp.n, dtype)
        self._solution = None

        @jax.jit
        def _solve(z0, lam0, lam_box0, lbx, ubx, gl, gu, prm):
            bounds = NLPBounds(lbx=lbx, ubx=ubx, gl=gl, gu=gu)
            if solver == "ip":
                return nlp_ip_solve(self.tr.nlp, z0, p=prm, bounds=bounds,
                                    lam0=lam0, settings=self.settings)
            return sqp_solve(self.tr.nlp, z0, p=prm, bounds=bounds,
                             lam0=lam0, lam_box0=lam_box0,
                             settings=self.settings)
        self._jitted_solve = _solve

    # ---- bound management (mpc_wrapper.hpp:103-181) ----
    def control_bounds(self, lbu, ubu):
        self._Ul = jnp.tile(jnp.asarray(lbu, self.dtype)[None], (self.tr.N, 1))
        self._Uu = jnp.tile(jnp.asarray(ubu, self.dtype)[None], (self.tr.N, 1))

    def state_bounds(self, lbx, ubx):
        self._Xl = jnp.tile(jnp.asarray(lbx, self.dtype)[None], (self.tr.N, 1))
        self._Xu = jnp.tile(jnp.asarray(ubx, self.dtype)[None], (self.tr.N, 1))

    def state_trajectory_bounds(self, Xl, Xu):
        """Per-node (N, nx) state bounds (mpc_wrapper.hpp:121-139)."""
        self._Xl = jnp.asarray(Xl, self.dtype)
        self._Xu = jnp.asarray(Xu, self.dtype)

    def control_trajectory_bounds(self, Ul, Uu):
        self._Ul = jnp.asarray(Ul, self.dtype)
        self._Uu = jnp.asarray(Uu, self.dtype)

    def final_state_bounds(self, lbxf, ubxf):
        self._Xl = self._Xl.at[-1].set(jnp.asarray(lbxf, self.dtype))
        self._Xu = self._Xu.at[-1].set(jnp.asarray(ubxf, self.dtype))

    def parameters_bounds(self, lbp, ubp):
        self._pl = jnp.asarray(lbp, self.dtype)
        self._pu = jnp.asarray(ubp, self.dtype)

    def constraints_bounds(self, gl, gu):
        self._gl = jnp.asarray(gl, self.dtype)
        self._gu = jnp.asarray(gu, self.dtype)

    def set_static_parameters(self, d):
        self._d = jnp.asarray(d, self.dtype)

    def set_time_limits(self, t0, tf):
        """Runtime horizon change — no recompilation (continuous_ocp.hpp:147)."""
        self._t0 = jnp.asarray(t0, self.dtype)
        self._tf = jnp.asarray(tf, self.dtype)

    def initial_conditions(self, x0, relax=None):
        """Pin the first state node to x0 (mpc_wrapper.hpp:89-99).

        relax: optional (nx,) per-state half-widths — state i's initial
        condition becomes the box [x0_i - relax_i, x0_i + relax_i] instead
        of an exact pin.  The reference's NMPF uses this to relax the
        virtual path states by +-flexibility each control step
        (nmpf.hpp:456-466) while the physical states stay pinned.
        """
        self._x0 = jnp.asarray(x0, self.dtype)
        self._x0_relax = None if relax is None \
            else jnp.abs(jnp.asarray(relax, self.dtype))

    # ---- warm-start guesses (mpc_wrapper.hpp:190-205) ----
    def x_guess(self, X):
        _, U, P = self._split(self._z)
        X = jnp.asarray(X, self.dtype) / jnp.asarray(self.tr.x_scale)
        if X.ndim == 1:
            X = jnp.tile(X[None], (self.tr.N, 1))
        else:
            X = X.reshape(self.tr.N, -1)
        self._z = pack_z(X, U, P)

    def u_guess(self, U):
        X, _, P = self._split(self._z)
        U = jnp.asarray(U, self.dtype) / jnp.asarray(self.tr.u_scale)
        if U.ndim == 1:
            U = jnp.tile(U[None], (self.tr.N, 1))
        self._z = pack_z(X, U, P)

    def p_guess(self, p):
        X, U, _ = self._split(self._z)
        self._z = pack_z(X, U, jnp.asarray(p, self.dtype)
                         / jnp.asarray(self.tr.p_scale))

    def lam_guess(self, lam):
        self._lam = jnp.asarray(lam, self.dtype)

    def _split(self, z):
        return split_z(z, self.ocp.nx, self.ocp.nu, self.tr.N, self.ocp.np_)

    # ---- checkpoint / resume (no reference analogue: the C++ warm start
    # lives only in memory, sqp_base.hpp:613-615; here a controller restart
    # can resume from the last warm start) ----
    def warm_state(self):
        """The warm-start pytree: (z, lam, lam_box)."""
        return (self._z, self._lam, self._lam_box)

    def save_state(self, path: str):
        from polympc_tpu.utils.checkpoint import save_pytree
        save_pytree(path, self.warm_state())

    def load_state(self, path: str):
        from polympc_tpu.utils.checkpoint import load_pytree
        self._z, self._lam, self._lam_box = load_pytree(
            path, self.warm_state())

    # ---- solve ----
    def solve(self):
        N = self.tr.N
        sx = jnp.asarray(self.tr.x_scale, self.dtype)
        su = jnp.asarray(self.tr.u_scale, self.dtype)
        sp = jnp.asarray(self.tr.p_scale, self.dtype)
        Xl, Xu = self._Xl, self._Xu
        if self._x0 is not None:
            if self._x0_relax is None:
                Xl = Xl.at[0].set(self._x0)
                Xu = Xu.at[0].set(self._x0)
            else:
                # relaxed IC box (nmpf.hpp:456-466): overwrites the global
                # state bounds at the initial node, like the reference
                Xl = Xl.at[0].set(self._x0 - self._x0_relax)
                Xu = Xu.at[0].set(self._x0 + self._x0_relax)
            # seed the guess's first state node with x0 (scaled internally)
            X, U, P = self._split(self._z)
            self._z = pack_z(X.at[0].set(self._x0 / sx), U, P)
        lbx = jnp.concatenate([(Xl / sx).reshape(-1),
                               (self._Ul / su).reshape(-1), self._pl / sp])
        ubx = jnp.concatenate([(Xu / sx).reshape(-1),
                               (self._Uu / su).reshape(-1), self._pu / sp])
        gl = jnp.tile(self._gl[None], (N, 1)).reshape(-1)
        gu = jnp.tile(self._gu[None], (N, 1)).reshape(-1)
        prm = {"p": jnp.zeros(self.ocp.np_, self.dtype), "d": self._d,
               "t0": self._t0, "tf": self._tf}
        sol = self._jitted_solve(self._z, self._lam, self._lam_box,
                                 lbx, ubx, gl, gu, prm)
        self._solution = sol
        self._z = sol.x
        self._lam = sol.lam
        self._lam_box = sol.lam_box
        return sol

    # ---- solution access (mpc_wrapper.hpp:230-295) ----
    @property
    def info(self):
        return self._solution

    def solution_x(self):
        return self.tr.unpack(self._solution.x)[0]

    def solution_u(self):
        return self.tr.unpack(self._solution.x)[1]

    def solution_p(self):
        return self.tr.unpack(self._solution.x)[2]

    def solution_x_at(self, t):
        """Lagrange-interpolated state at arbitrary t in [t0, tf]
        (mpc_wrapper.hpp:245-281)."""
        P = self.mesh.interp_matrix(t, float(self._t0), float(self._tf))
        return jnp.asarray(P) @ self.solution_x()

    def solution_u_at(self, t):
        P = self.mesh.interp_matrix(t, float(self._t0), float(self._tf))
        return jnp.asarray(P) @ self.solution_u()
