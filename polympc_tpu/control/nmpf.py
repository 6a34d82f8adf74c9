"""Path-following NMPC (NMPF): follow a geometric path at a reference speed.

TPU-native re-design of the reference's ``nmpf`` class (src/nmpf.hpp:19-606):

  1. augment the state with a virtual path state v = (s, s_dot),
     v_dot = Av v + Bv u_v with Av = [[0,1],[0,0]], Bv = [0;1]
     (nmpf.hpp:268-282) -> aug state dim nx+2, aug control dim nu+1;
  2. Lagrange cost ||path(s) - output(x)||^2_Q + W (v_ref - s_dot)^2
     + ||u_aug||^2_R; Mayer = path residual (nmpf.hpp:336-358);
  3. collocate (default order 5, 2 segments) and solve with warm-started SQP
     (the reference calls Ipopt, nmpf.hpp:412 — here the same SQP stack as
     everything else);
  4. per-step ``compute_control`` (nmpf.hpp:433-501): pin the measured state,
     wrap/reset the virtual path state when it passes the path period,
     warm-start primal and duals;
  5. ``find_closest_point_on_path``: 1-D projection min_s ||p - path(s)||^2
     by dense grid search + Newton refinement.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from polympc_tpu.basis.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control.mpc import MPC
from polympc_tpu.nlp.types import SQPSettings
from polympc_tpu.ocp.ocp import OCP
from polympc_tpu.qp.types import ADMMSettings

__all__ = ["NMPF", "augment_ocp"]


def augment_ocp(dynamics: Callable, output: Callable, path: Callable,
                nx: int, nu: int, ny: int,
                Q=None, R=None, W: float = 1.0) -> OCP:
    """Build the augmented path-following OCP.

    dynamics: (x, u) -> xdot ;  output: x -> y (ny,) ;  path: s -> (ny,).
    Parameter pytree d = [v_ref]; aug state (x, s, s_dot), aug control
    (u, u_v).
    """
    Qm = jnp.eye(ny) if Q is None else jnp.asarray(Q)
    Rm = jnp.eye(nu + 1) if R is None else jnp.asarray(R)

    def aug_dynamics(xa, ua, p, d, t):
        x, v = xa[:nx], xa[nx:]
        xdot = dynamics(x, ua[:nu])
        return jnp.concatenate([xdot, jnp.array([v[1], ua[nu]])])

    def lagrange(xa, ua, p, d, t):
        x, v = xa[:nx], xa[nx:]
        res = path(v[0]) - output(x)
        vref = d[0]
        return res @ Qm @ res + W * (vref - v[1]) ** 2 + ua @ Rm @ ua

    def mayer(xa, p, d):
        x, v = xa[:nx], xa[nx:]
        res = path(v[0]) - output(x)
        return res @ Qm @ res

    return OCP(dynamics=aug_dynamics, nx=nx + 2, nu=nu + 1, nd=1,
               lagrange=lagrange, mayer=mayer)


class NMPF:
    """Stateful path-following controller (the nmpf.hpp user API)."""

    def __init__(self, dynamics, output, path, nx, nu, ny,
                 tf: float = 2.0,
                 mesh: SegmentedBasis | None = None,
                 Q=None, R=None, W: float = 1.0,
                 path_period: float = 2.0 * np.pi,
                 flexibility: float = 0.1,
                 settings: SQPSettings | None = None):
        self.nx, self.nu, self.ny = nx, nu, ny
        self.path = path
        self.output = output
        self.period = path_period
        self.flex = flexibility
        ocp = augment_ocp(dynamics, output, path, nx, nu, ny, Q=Q, R=R, W=W)
        if settings is None:
            settings = SQPSettings(
                hessian="exact", max_iter=60,
                qp=ADMMSettings(rho=1.0, eps_abs=1e-6, eps_rel=1e-6,
                                max_epochs=40, equil_iters=4))
        self.mpc = MPC(ocp, mesh or SegmentedBasis(Chebyshev(5), 2),
                       t0=0.0, tf=tf, settings=settings)
        self.mpc.set_static_parameters([0.05])
        self._initialised = False

        # jitted 1-D path projection: grid + 5 Newton steps (nmpf.hpp
        # findClosestPointOnPath)
        grid = jnp.linspace(0.0, path_period, 256)

        @jax.jit
        def _closest(point):
            d2 = jax.vmap(lambda s: jnp.sum((path(s) - point) ** 2))(grid)
            s0 = grid[jnp.argmin(d2)]
            f = lambda s: jnp.sum((path(s) - point) ** 2)
            df = jax.grad(f)
            ddf = jax.grad(df)

            def newton(s, _):
                h = ddf(s)
                step = df(s) / jnp.where(jnp.abs(h) > 1e-9, h, 1.0)
                return s - jnp.clip(step, -0.1 * path_period,
                                    0.1 * path_period), None
            s, _ = jax.lax.scan(newton, s0, None, length=5)
            return s
        self._closest = _closest

    def set_reference_velocity(self, v_ref: float):
        self.mpc.set_static_parameters([v_ref])

    def control_bounds(self, lbu, ubu):
        """Bounds on the augmented control (u, u_v) (setLBU/setUBU)."""
        self.mpc.control_bounds(lbu, ubu)

    def state_bounds(self, lbx, ubx):
        """Bounds on the augmented state (x, s, s_dot) (setLBX/setUBX)."""
        self._lbx = np.asarray(lbx, np.float64)
        self._ubx = np.asarray(ubx, np.float64)
        self.mpc.state_bounds(lbx, ubx)

    def find_closest_point_on_path(self, point):
        return float(self._closest(jnp.asarray(point)))

    def compute_control(self, x):
        """One NMPF step (nmpf.hpp:433-501): returns the optimal augmented
        control at the current state."""
        x = np.asarray(x, np.float64)
        if x.shape[0] == self.nx:
            # initialise the virtual state by projecting the system output
            # onto the path (nmpf.hpp findClosestPointOnPath)
            y = np.asarray(self.output(jnp.asarray(x)))
            s0 = self.find_closest_point_on_path(y)
            xa = np.concatenate([x, [s0, 0.0]])
        else:
            xa = x.copy()

        # wrap the path parameter into [0, period); the warm-start
        # trajectory's s column shifts with it so the previous solution
        # stays consistent (nmpf.hpp:444-454 shifts NLP_X's s entries)
        shift = 0.0
        if xa[self.nx] >= self.period:
            shift = -self.period
        elif xa[self.nx] < 0.0:
            shift = self.period
        if shift:
            xa[self.nx] += shift
            if self._initialised:
                X, U, P = self.mpc._split(self.mpc._z)
                sxs = float(np.asarray(self.mpc.tr.x_scale)[self.nx])
                X = X.at[:, self.nx].add(shift / sxs)
                from polympc_tpu.ocp.transcription import pack_z
                self.mpc._z = pack_z(X, U, P)

        # pin the physical states exactly, box the virtual states (s, s_dot)
        # by +-flexibility (nmpf.hpp:456-466)
        relax = np.zeros(self.nx + 2)
        relax[self.nx:] = self.flex
        self.mpc.initial_conditions(xa, relax=relax)
        if not self._initialised:
            self.mpc.x_guess(xa)
            self._initialised = True
        sol = self.mpc.solve()
        u = np.asarray(self.mpc.solution_u())[0]
        self._last = sol
        return u, sol

    def optimal_trajectory(self):
        return self.mpc.solution_x()

    def solution_info(self):
        return self._last
