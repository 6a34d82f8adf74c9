"""Chebyshev/Legendre pseudospectral collocation transcription: OCP -> NLP.

TPU-native re-design of the reference's ``ContinuousOCP`` transcription
(continuous_ocp.hpp:739-1207).  Key differences (SURVEY.md §7):

  - decision vector z = [X (N*nx); U (N*nu); P (np_)] in FORWARD time order —
    node 0 is t0 (the reference stores trajectories reversed,
    continuous_ocp.hpp:55,158; we deliberately do not copy that quirk);
  - defect constraints are a dense composite-differentiation matmul
    ``Dg @ X - scale * f(X, U, p, t)`` evaluated with one ``vmap`` over nodes
    — an (N,N)x(N,nx) matmul on the MXU instead of sparse Kronecker inserts
    (continuous_ocp.hpp:896-954);
  - derivatives come from jax.jacfwd/jax.hessian on the whole transcribed
    functions (the per-node block structure is exploited later by structured
    jacobian assembly and the Pallas KKT kernel, not by sparse formats);
  - time limits [t0, tf] are *runtime* values in the parameter pytree, so one
    compiled solver serves any horizon (the reference recomputes composite
    matrices in ``set_time_limits``, continuous_ocp.hpp:147-159).

The transcribed NLP's parameter pytree is
    {"p": (np_,), "d": (nd,), "t0": scalar, "tf": scalar}.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import SegmentedBasis
from polympc_tpu.nlp.types import NLP, NLPBounds
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.utils.precision import full_precision
from polympc_tpu.utils.solver_utils import block_diag_scatter

__all__ = ["Transcription", "transcribe", "split_z", "pack_z",
           "SpectralOps"]


class SpectralOps(NamedTuple):
    """Spectral operators handed to trajectory-level OCP hooks: ``D`` is the
    (N,N) physical-time differentiation matrix (D @ X ~= dX/dt at the
    nodes), ``w`` the (N,) physical quadrature weights — the TPU form of
    GenericOCP's diff/ddiff/norm_diff/norm_ddiff operators
    (generic_ocp.hpp:88-101)."""
    D: jnp.ndarray
    w: jnp.ndarray


def split_z(z, nx, nu, N, np_):
    """z -> (X (N,nx), U (N,nu), P (np_,))."""
    X = z[: N * nx].reshape(N, nx)
    U = z[N * nx: N * (nx + nu)].reshape(N, nu)
    P = z[N * (nx + nu):]
    return X, U, P


def pack_z(X, U, P=None):
    parts = [X.reshape(-1), U.reshape(-1)]
    if P is not None and jnp.size(P):
        parts.append(jnp.reshape(P, (-1,)))
    return jnp.concatenate(parts)


@dataclasses.dataclass(frozen=True)
class Transcription:
    """Static transcription: OCP + mesh -> NLP with collocation constants.

    Attributes mirror what jitted code needs as constants:
      Dg_unit: composite differentiation matrix for unit segments (dt=2),
               scaled at trace time by 2*NS/(tf-t0);
      w_unit:  composite quadrature weights for unit segments, scaled by
               (tf-t0)/(2*NS);
      tau:     normalised time grid on [0, 1].
    """
    ocp: OCP
    mesh: SegmentedBasis
    nlp: NLP
    Dg_unit: np.ndarray
    w_unit: np.ndarray
    tau: np.ndarray
    x_scale: np.ndarray = None
    u_scale: np.ndarray = None
    p_scale: np.ndarray = None

    @property
    def N(self) -> int:
        return self.mesh.num_nodes

    @property
    def n_vars(self) -> int:
        return self.nlp.n

    def initial_guess(self, x0=None, dtype=jnp.float64):
        """Constant-trajectory initial guess (x0 tiled, zero controls/params),
        in *physical* units (scaling applied internally)."""
        N = self.N
        X = jnp.zeros((N, self.ocp.nx), dtype) if x0 is None else \
            jnp.tile(jnp.asarray(x0, dtype)[None, :], (N, 1))
        U = jnp.zeros((N, self.ocp.nu), dtype)
        P = jnp.zeros(self.ocp.np_, dtype)
        return self.pack(X, U, P)

    def pack(self, X, U, P=None):
        """Physical (X, U, P) -> scaled decision vector z (keeps X's dtype:
        the f64 scale constants must not promote an f32 guess under
        enable_x64)."""
        X = jnp.asarray(X)
        dt = X.dtype
        X = X / jnp.asarray(self.x_scale, dt)
        U = jnp.asarray(U, dt) / jnp.asarray(self.u_scale, dt)
        if P is not None and self.ocp.np_:
            P = jnp.asarray(P, dt) / jnp.asarray(self.p_scale, dt)
        return pack_z(X, U, P)

    def unpack(self, z):
        """Scaled decision vector z -> physical (X, U, P)."""
        X, U, P = split_z(z, self.ocp.nx, self.ocp.nu, self.N, self.ocp.np_)
        return (X * jnp.asarray(self.x_scale),
                U * jnp.asarray(self.u_scale),
                P * jnp.asarray(self.p_scale))

    def rollout_guess(self, x0, prm, U=None, substeps: int = 4):
        """Initial guess by RK4 rollout of the dynamics through the time grid
        (far better than a constant guess for drift-dominated systems).

        x0 physical (nx,); U physical (N, nu) or None (zeros); returns packed
        scaled z.  jnp-traceable and vmappable over x0/U.
        """
        ocp, N = self.ocp, self.N
        dtype = jnp.asarray(x0).dtype
        tgrid = prm["t0"] + (prm["tf"] - prm["t0"]) * jnp.asarray(
            self.tau, dtype)
        if U is None:
            U = jnp.zeros((N, ocp.nu), dtype)
        P = prm["p"]
        d = prm["d"]

        def f(x, u, t):
            return ocp.dynamics(x, u, P, d, t)

        def step(x, args):
            t0_, t1_, u = args
            h = (t1_ - t0_) / substeps

            def sub(x, k):
                t = t0_ + h * k
                k1 = f(x, u, t)
                k2 = f(x + 0.5 * h * k1, u, t + 0.5 * h)
                k3 = f(x + 0.5 * h * k2, u, t + 0.5 * h)
                k4 = f(x + h * k3, u, t + h)
                # cast back: user dynamics may promote to f64 (e.g. f64
                # spline coefficients under enable_x64), which would break
                # the scan carry when the guess is requested in f32
                xn = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
                return xn.astype(dtype), None
            x, _ = jax.lax.scan(sub, x, jnp.arange(substeps, dtype=dtype))
            return x, x

        _, X_tail = jax.lax.scan(
            step, jnp.asarray(x0, dtype), (tgrid[:-1], tgrid[1:], U[:-1]))
        X = jnp.concatenate([jnp.asarray(x0, dtype)[None], X_tail], axis=0)
        return self.pack(X, U, P if ocp.np_ else None)

    def bbt_structure(self):
        """BBT permutation metadata of this transcription's boxADMM KKT
        (ops/structure.py) — hand it to ``ADMMSettings(structure=...)`` with
        ``kkt_solver="pallas"`` to run the structured KKT kernel, the
        TPU-native analogue of the reference's sparse path
        (continuous_ocp.hpp:341-376).

        Returns None when the KKT is not bordered-block-tridiagonal:
        trajectory-level hooks couple nodes densely, Radau meshes add
        continuity rows, and soft-defect transcriptions have no defect
        duals at all.
        """
        from polympc_tpu.ops.structure import bbt_structure as _bbt
        ocp = self.ocp
        if (not self.mesh.shares_boundary
                or ocp.trajectory_cost is not None
                or ocp.trajectory_ineq is not None
                or self.nlp.eq is None):
            return None
        return _bbt(self.N, ocp.nx, ocp.nu, ocp.ng, ocp.np_, ocp.ntg,
                    self.mesh.order, self.mesh.num_segments)

    def params(self, p=None, d=None, t0=0.0, tf=1.0, dtype=jnp.float64):
        return {
            "p": jnp.zeros(self.ocp.np_, dtype) if p is None
            else jnp.asarray(p, dtype),
            "d": jnp.zeros(self.ocp.nd, dtype) if d is None
            else jnp.asarray(d, dtype),
            "t0": jnp.asarray(t0, dtype),
            "tf": jnp.asarray(tf, dtype),
        }


def transcribe(ocp: OCP, mesh: SegmentedBasis,
               x_scale=None, u_scale=None, p_scale=None,
               soft_defects: float = 0.0) -> Transcription:
    """Build the collocation NLP for an OCP on the given multi-segment mesh.

    x_scale/u_scale/p_scale: optional per-variable scaling (physical value =
    scale * decision variable).  The NLP is posed in scaled variables so all
    decision variables are O(1) — essential for first-order QP solvers on
    problems like the CSTR whose natural units span 5 orders of magnitude
    (the role of the scaling matrices in the reference's legacy layer,
    generic_ocp.hpp:88-120).

    soft_defects > 0 moves the dynamics defects into the cost as a quadratic
    penalty  soft_defects * ||defects||^2  instead of equality constraints —
    the reference's SoftChebyshev transcription (chebyshev_soft.hpp:15-72).
    """
    N = mesh.num_nodes
    nx, nu, np_, ng = ocp.nx, ocp.nu, ocp.np_, ocp.ng
    if not mesh.basis.has_left_endpoint:
        raise NotImplementedError(
            "collocation transcription needs the left endpoint in the node "
            "set to pin initial conditions — use a Lobatto or Radau basis "
            "(Gauss is for quadrature/projection/integration)")
    has_tf = mesh.basis.has_right_endpoint
    sx = np.ones(nx) if x_scale is None else np.asarray(x_scale, np.float64)
    su = np.ones(nu) if u_scale is None else np.asarray(u_scale, np.float64)
    sp = np.ones(np_) if p_scale is None else np.asarray(p_scale, np.float64)
    n = N * (nx + nu) + np_
    # non-boundary-sharing meshes (Radau) glue segments with explicit
    # linear continuity rows (Lobatto gets them for free via shared nodes)
    Rcont = mesh.continuity_matrix()                      # (S-1 or 0, N)
    n_cont = Rcont.shape[0] * nx
    ne = 0 if soft_defects > 0.0 else N * nx + n_cont
    ni = N * ng + ocp.ntg
    # Mayer lands on the interpolated endpoint when tf is not a node
    r_tf = None if has_tf else mesh.interp_matrix([1.0], 0.0, 1.0)[0]
    mayer_interp = (ocp.mayer is not None) and not has_tf

    NS = mesh.num_segments
    # unit-segment composite operators: built once in numpy float64
    Dg_unit = mesh.composite_diff_matrix(0.0, 2.0 * NS)   # scale 2/dt = 1
    w_unit = mesh.quadrature_weights(0.0, 2.0 * NS)       # dt/2 = 1 per seg
    tau = mesh.time_nodes(0.0, 1.0)

    def _times(prm, dtype):
        t0, tf = prm["t0"], prm["tf"]
        return t0 + (tf - t0) * jnp.asarray(tau, dtype)

    def _unscale(z):
        X, U, P = split_z(z, nx, nu, N, np_)
        return (X * jnp.asarray(sx, z.dtype), U * jnp.asarray(su, z.dtype),
                P * jnp.asarray(sp, z.dtype))

    def _spectral_ops(prm, dtype):
        """Physical-time spectral operators handed to trajectory-level hooks
        (the GenericOCP diff/ddiff operators, generic_ocp.hpp:88-101):
        ops.D @ X ~= dX/dt at the nodes; ops.w are quadrature weights for
        integral terms over [t0, tf]."""
        scale = (prm["tf"] - prm["t0"]) / (2.0 * NS)
        return SpectralOps(D=jnp.asarray(Dg_unit, dtype) / scale,
                           w=scale * jnp.asarray(w_unit, dtype))

    def eq_fn(z, prm):
        """Collocation defects Dg@X~ - scale*f/sx at every node, row-major
        (N,nx) flattened (ref: continuous_ocp.hpp:739-766), followed by the
        inter-segment continuity rows on non-boundary-sharing (Radau)
        meshes.  Rows are in scaled state units so defect magnitudes are
        commensurate."""
        X, U, P = _unscale(z)
        t = _times(prm, z.dtype)
        d = prm["d"]
        # cast: user dynamics may carry f64 constants (e.g. spline
        # coefficients) that would promote the whole NLP under enable_x64
        f = jax.vmap(lambda xk, uk, tk: ocp.dynamics(xk, uk, P, d, tk))(
            X, U, t).astype(z.dtype)
        scale = (prm["tf"] - prm["t0"]) / (2.0 * NS)
        Dg = jnp.asarray(Dg_unit, z.dtype)
        sxj = jnp.asarray(sx, z.dtype)
        rows = (Dg @ (X / sxj) - scale * f / sxj).reshape(-1)
        if n_cont:
            cont = (jnp.asarray(Rcont, z.dtype) @ (X / sxj)).reshape(-1)
            rows = jnp.concatenate([rows, cont])
        return rows

    def cost_fn(z, prm):
        """Quadrature Lagrange cost + Mayer at the final node
        (ref: continuous_ocp.hpp:1182-1207; Mayer at node 0 there because of
        reverse ordering — here the final node is t = tf)."""
        X, U, P = _unscale(z)
        t = _times(prm, z.dtype)
        d = prm["d"]
        total = jnp.zeros((), z.dtype)
        if soft_defects > 0.0:
            defects = eq_fn(z, prm)
            total = total + soft_defects * (defects @ defects)
        if ocp.lagrange is not None:
            L = jax.vmap(lambda xk, uk, tk: ocp.lagrange(xk, uk, P, d, tk))(
                X, U, t)
            scale = (prm["tf"] - prm["t0"]) / (2.0 * NS)
            total = total + scale * (jnp.asarray(w_unit, z.dtype) @ L)
        if ocp.mayer is not None:
            x_end = X[-1] if has_tf else jnp.asarray(r_tf, z.dtype) @ X
            total = total + ocp.mayer(x_end, P, d)
        if ocp.trajectory_cost is not None:
            total = total + ocp.trajectory_cost(
                X, U, P, d, t, _spectral_ops(prm, z.dtype))
        return total.astype(z.dtype)

    ineq_fn = None
    if ocp.ineq is not None or ocp.trajectory_ineq is not None:
        def ineq_fn(z, prm):
            X, U, P = _unscale(z)
            t = _times(prm, z.dtype)
            d = prm["d"]
            rows = []
            if ocp.ineq is not None:
                G = jax.vmap(lambda xk, uk, tk: ocp.ineq(xk, uk, P, d, tk))(
                    X, U, t)
                rows.append(G.reshape(-1))
            if ocp.trajectory_ineq is not None:
                rows.append(ocp.trajectory_ineq(
                    X, U, P, d, t, _spectral_ops(prm, z.dtype)))
            out = jnp.concatenate(rows) if len(rows) > 1 else rows[0]
            return out.astype(z.dtype)

    # ---- structured derivatives ----
    # The collocation NLP's derivative structure (continuous_ocp.hpp's sparse
    # AD machinery, :796-1906) maps to dense-block assembly on TPU:
    #   eq Jacobian   = kron(Dg, I_nx) - blockdiag(scale * df/d(x,u))
    #                   + parameter arrow column;
    #   Lagrangian Hessian = per-node (x_k,u_k,P) Hessian blocks (the cross-
    #   node coupling Dg is linear, so it contributes nothing) assembled as
    #   block-diagonal + P arrow.
    # Per-node derivative work is O(N * (nx+nu+np)^2) instead of O(n^2) whole-
    # vector AD.
    KD = np.kron(Dg_unit, np.eye(nx))          # (N*nx, N*nx), static
    # continuity rows are linear with a constant Jacobian (Radau meshes)
    KC = np.concatenate(
        [np.kron(Rcont, np.eye(nx)), np.zeros((n_cont, N * nu + np_))],
        axis=1) if n_cont else None
    q_xu = nx + nu

    def _node_parts(z, prm):
        X, U, P = split_z(z, nx, nu, N, np_)   # scaled
        t = _times(prm, z.dtype)
        d = prm["d"]
        return X, U, P, t, d

    def _dyn_scaled(xs, us, Ps, d, tk, dtype):
        """Scaled-variable dynamics: returns scale-free f~ = f(..)/sx."""
        x = xs * jnp.asarray(sx, dtype)
        u = us * jnp.asarray(su, dtype)
        p = Ps * jnp.asarray(sp, dtype)
        return (ocp.dynamics(x, u, p, d, tk)
                / jnp.asarray(sx, dtype)).astype(dtype)

    def eq_jac_fn(z, prm):
        X, U, P, t, d = _node_parts(z, prm)
        scale = (prm["tf"] - prm["t0"]) / (2.0 * NS)

        jac = jax.vmap(
            lambda xs, us, tk: jax.jacfwd(_dyn_scaled, argnums=(0, 1, 2))(
                xs, us, P, d, tk, z.dtype))(X, U, t)
        fx, fu, fp = jac            # (N,nx,nx), (N,nx,nu), (N,nx,np_)
        Jx = jnp.asarray(KD, z.dtype) - scale * block_diag_scatter(fx)
        Ju = -scale * block_diag_scatter(fu)
        cols = [Jx, Ju]
        if np_:
            cols.append(-scale * fp.reshape(N * nx, np_))
        J = jnp.concatenate(cols, axis=1)
        if n_cont:
            J = jnp.concatenate([J, jnp.asarray(KC, z.dtype)], axis=0)
        return J

    def cost_grad_fn(z, prm):
        return jax.grad(lambda zz: cost_fn(zz, prm))(z)

    def _node_scalar(xs, us, Ps, d, tk, wk, lam_k, mu_k, is_last, prm, dtype):
        """Per-node scalar whose Hessian is this node's Lagrangian block:
        scale*w_k*L + lam_k'(-scale*f~) [+ Mayer at the last node]
        [+ mu_k' g at the node]."""
        scale = (prm["tf"] - prm["t0"]) / (2.0 * NS)
        x = xs * jnp.asarray(sx, dtype)
        u = us * jnp.asarray(su, dtype)
        p = Ps * jnp.asarray(sp, dtype)
        val = jnp.zeros((), dtype)
        if ocp.lagrange is not None:
            val = val + scale * wk * ocp.lagrange(x, u, p, d, tk)
        f_t = ocp.dynamics(x, u, p, d, tk) / jnp.asarray(sx, dtype)
        val = val - scale * (lam_k @ f_t)
        if ocp.mayer is not None and has_tf:
            # when tf is not a node the Mayer term couples the last
            # segment's nodes through the interpolation row — handled by the
            # trajectory-level dense Hessian path below, not per node
            val = val + jnp.where(is_last, ocp.mayer(x, p, d),
                                  jnp.zeros((), dtype))
        if ocp.ineq is not None:
            val = val + mu_k @ ocp.ineq(x, u, p, d, tk)
        return val.astype(dtype)

    def lag_hessian_fn(z, lam, prm):
        """Dense Lagrangian Hessian from per-node blocks (vs whole-vector
        jax.hessian: O(N q^2) instead of O(n^2) derivative passes)."""
        X, U, P, t, d = _node_parts(z, prm)
        dtype = z.dtype
        # only the N*nx defect duals carry curvature; continuity rows
        # (Radau meshes) are linear and contribute nothing to the Hessian
        lam_eq = lam[:N * nx].reshape(N, nx) if ne \
            else jnp.zeros((N, nx), dtype)
        mu = lam[ne:ne + N * ng].reshape(N, ng) if ng \
            else jnp.zeros((N, 0), dtype)
        wk = jnp.asarray(w_unit, dtype)
        is_last = jnp.arange(N) == N - 1

        def node_h(xs, us, tk, w, lk, mk, last):
            fun = lambda v: _node_scalar(
                v[:nx], v[nx:q_xu], v[q_xu:], d, tk, w, lk, mk, last,
                prm, dtype)
            v0 = jnp.concatenate([xs, us, P])
            # jacfwd-of-grad, NOT jax.hessian: jacrev's extra vmap layer
            # makes the TPU compiler pathological under the node vmap
            # (observed: 307 s vs 1.2 s compile for the kite model)
            return jax.jacfwd(jax.grad(fun))(v0)   # (q_xu+np_, q_xu+np_)

        Hn = jax.vmap(node_h)(X, U, t, wk, lam_eq, mu, is_last)

        XX = block_diag_scatter(Hn[:, :nx, :nx])
        XU = block_diag_scatter(Hn[:, :nx, nx:q_xu])
        UU = block_diag_scatter(Hn[:, nx:q_xu, nx:q_xu])
        if np_:
            Hxp = Hn[:, :nx, q_xu:].reshape(N * nx, np_)
            Hup = Hn[:, nx:q_xu, q_xu:].reshape(N * nu, np_)
            Hpp = jnp.sum(Hn[:, q_xu:, q_xu:], axis=0)
            top = jnp.concatenate([XX, XU, Hxp], axis=1)
            mid = jnp.concatenate([XU.T, UU, Hup], axis=1)
            bot = jnp.concatenate([Hxp.T, Hup.T, Hpp], axis=1)
            return jnp.concatenate([top, mid, bot], axis=0)
        top = jnp.concatenate([XX, XU], axis=1)
        mid = jnp.concatenate([XU.T, UU], axis=1)
        return jnp.concatenate([top, mid], axis=0)

    if ocp.trajectory_cost is not None or ocp.trajectory_ineq is not None \
            or mayer_interp:
        # trajectory-level terms couple nodes: add their exact (dense)
        # Hessian on top of the block-structured node Hessian
        _node_lag_hessian = lag_hessian_fn

        def _traj_scalar(z, mu_t, prm):
            X, U, P = _unscale(z)
            t = _times(prm, z.dtype)
            ops = _spectral_ops(prm, z.dtype)
            val = jnp.zeros((), z.dtype)
            if ocp.trajectory_cost is not None:
                val = val + ocp.trajectory_cost(X, U, P, prm["d"], t, ops)
            if mayer_interp:
                val = val + ocp.mayer(jnp.asarray(r_tf, z.dtype) @ X, P,
                                      prm["d"])
            if ocp.trajectory_ineq is not None:
                val = val + mu_t @ ocp.trajectory_ineq(X, U, P, prm["d"],
                                                       t, ops)
            return val.astype(z.dtype)

        def lag_hessian_fn(z, lam, prm):   # noqa: F811
            H = _node_lag_hessian(z, lam, prm)
            mu_t = lam[ne + N * ng:]
            Ht = jax.jacfwd(jax.grad(_traj_scalar))(z, mu_t, prm)
            return H + Ht

    def _traj_ineq_rows(z, prm):
        X, U, P = _unscale(z)
        t = _times(prm, z.dtype)
        return ocp.trajectory_ineq(X, U, P, prm["d"], t,
                                   _spectral_ops(prm, z.dtype))

    ineq_jac_fn = None
    if ocp.ineq is not None:
        def _ineq_scaled(xs, us, Ps, d, tk, dtype):
            x = xs * jnp.asarray(sx, dtype)
            u = us * jnp.asarray(su, dtype)
            p = Ps * jnp.asarray(sp, dtype)
            return jnp.asarray(ocp.ineq(x, u, p, d, tk), dtype)

        def ineq_jac_fn(z, prm):
            X, U, P, t, d = _node_parts(z, prm)
            jac = jax.vmap(
                lambda xs, us, tk: jax.jacfwd(
                    _ineq_scaled, argnums=(0, 1, 2))(
                    xs, us, P, d, tk, z.dtype))(X, U, t)
            gx, gu, gp = jac
            Gx = block_diag_scatter(gx)
            Gu = block_diag_scatter(gu)
            cols = [Gx, Gu]
            if np_:
                cols.append(gp.reshape(N * ng, np_))
            J = jnp.concatenate(cols, axis=1)
            if ocp.trajectory_ineq is not None:
                Jt = jax.jacfwd(_traj_ineq_rows)(z, prm)
                J = jnp.concatenate([J, Jt], axis=0)
            return J
    elif ocp.trajectory_ineq is not None:
        def ineq_jac_fn(z, prm):
            return jax.jacfwd(_traj_ineq_rows)(z, prm)

    def gn_hessian_fn(z, prm):
        """Gauss-Newton Hessian: curvature of the cost only (constraint
        curvature dropped) — the PSD model Hessian for tracking /
        identification least-squares costs."""
        m_total = ne + ni
        return lag_hessian_fn(z, jnp.zeros(m_total, z.dtype), prm)

    soft = soft_defects > 0.0
    nlp = NLP(cost=cost_fn, n=n,
              eq=None if soft else eq_fn, ne=ne,
              ineq=ineq_fn, ni=ni,
              cost_grad=None,
              eq_jac=None if soft else eq_jac_fn,
              ineq_jac=ineq_jac_fn,
              lag_hessian=None if soft else lag_hessian_fn,
              gn_hessian=gn_hessian_fn,
              block_structure=(N, nx, nu, np_))
    return Transcription(ocp=ocp, mesh=mesh, nlp=nlp,
                         Dg_unit=Dg_unit, w_unit=w_unit, tau=tau,
                         x_scale=sx, u_scale=su, p_scale=sp)


def ocp_bounds(tr: Transcription,
               xl=None, xu=None, ul=None, uu=None, pl=None, pu=None,
               gl=None, gu=None, x0=None, xf=None,
               tgl=None, tgu=None,
               dtype=jnp.float64) -> NLPBounds:
    """Assemble NLP box/row bounds from per-variable OCP bounds.

    Mirrors the MPC wrapper's bound management (mpc_wrapper.hpp:89-181):
    x0/xf pin the first/last state node by equality (initial/terminal
    conditions); state/control bounds broadcast over nodes.
    """
    ocp, N = tr.ocp, tr.N
    inf = np.inf

    def _fill(v, size, default):
        if v is None:
            return jnp.full(size, default, dtype)
        return jnp.asarray(v, dtype)

    sx = jnp.asarray(tr.x_scale, dtype)
    su = jnp.asarray(tr.u_scale, dtype)
    sp = jnp.asarray(tr.p_scale, dtype)
    xl = _fill(xl, ocp.nx, -inf) / sx
    xu = _fill(xu, ocp.nx, inf) / sx
    ul = _fill(ul, ocp.nu, -inf) / su
    uu = _fill(uu, ocp.nu, inf) / su
    pl = _fill(pl, ocp.np_, -inf) / sp
    pu = _fill(pu, ocp.np_, inf) / sp

    Xl = jnp.tile(xl[None, :], (N, 1))
    Xu = jnp.tile(xu[None, :], (N, 1))
    if x0 is not None:
        x0 = jnp.asarray(x0, dtype) / sx
        Xl = Xl.at[0].set(x0)
        Xu = Xu.at[0].set(x0)
    if xf is not None:
        if not tr.mesh.basis.has_right_endpoint:
            raise ValueError(
                "terminal-state pinning needs tf in the node set (Lobatto "
                "or flipped Radau); this mesh's last node is interior")
        xf = jnp.asarray(xf, dtype) / sx
        Xl = Xl.at[-1].set(xf)
        Xu = Xu.at[-1].set(xf)
    Ul = jnp.tile(ul[None, :], (N, 1))
    Uu = jnp.tile(uu[None, :], (N, 1))

    lbx = jnp.concatenate([Xl.reshape(-1), Ul.reshape(-1), pl])
    ubx = jnp.concatenate([Xu.reshape(-1), Uu.reshape(-1), pu])

    gl_row = _fill(gl, ocp.ng, -inf)
    gu_row = _fill(gu, ocp.ng, inf)
    GL = jnp.tile(gl_row[None, :], (N, 1)).reshape(-1)
    GU = jnp.tile(gu_row[None, :], (N, 1)).reshape(-1)
    if ocp.ntg:
        GL = jnp.concatenate([GL, _fill(tgl, ocp.ntg, -inf)])
        GU = jnp.concatenate([GU, _fill(tgu, ocp.ntg, inf)])
    return NLPBounds(lbx=lbx, ubx=ubx, gl=GL, gu=GU)
