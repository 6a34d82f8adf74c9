"""Dense active-set QP solve (native Goldfarb-Idnani, host CPU).

The analogue of the reference's QPMAD interface
(src/solvers/qpmad_interface.hpp:18-126, dense-only Goldfarb-Idnani
active set).  Active-set pivoting is data-dependent sequential control flow —
the wrong shape for XLA — so the solver is C++ on the host
(polympc_tpu/native/qpmad.cpp); use it for small setup-time QPs (spline
fitting, projections) and as an independent high-accuracy oracle against the
ADMM/IP solvers.  Unlike the reference's interface (no dual extraction,
qpmad_interface.hpp:70-78), this one returns full duals in the common
``Hx + h + A'y + y_box = 0`` convention.
"""
from __future__ import annotations

import ctypes

import numpy as np
import jax.numpy as jnp

from polympc_tpu.native import load_native
from polympc_tpu.qp.types import QPData, QPSolution
from polympc_tpu.utils import status as st

__all__ = ["qp_active_set_solve"]

_f64p = ctypes.POINTER(ctypes.c_double)


def _lib():
    lib = load_native("qpmad")
    fn = lib.qpmad_solve
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_int, ctypes.c_int,
                   _f64p, _f64p, _f64p, _f64p, _f64p, _f64p, _f64p,
                   _f64p, _f64p, _f64p,
                   ctypes.c_int, ctypes.c_double,
                   ctypes.POINTER(ctypes.c_int)]
    return fn


def qp_active_set_solve(qp: QPData, max_iter: int = 500,
                        tol: float = 1e-10) -> QPSolution:
    """Solve the QP exactly (to working precision) with the native dual
    active-set method.  Host-side, not jittable; H must be positive definite.
    """
    H = np.ascontiguousarray(np.asarray(qp.H, np.float64))
    h = np.ascontiguousarray(np.asarray(qp.h, np.float64))
    A = np.ascontiguousarray(np.asarray(qp.A, np.float64))
    al = np.ascontiguousarray(np.asarray(qp.al, np.float64))
    au = np.ascontiguousarray(np.asarray(qp.au, np.float64))
    xl = np.ascontiguousarray(np.asarray(qp.xl, np.float64))
    xu = np.ascontiguousarray(np.asarray(qp.xu, np.float64))
    n = H.shape[0]
    m = A.shape[0] if A.ndim == 2 else 0

    x = np.zeros(n)
    y = np.zeros(max(m, 1))
    ybox = np.zeros(n)
    iters = ctypes.c_int(0)

    def p(a):
        return a.ctypes.data_as(_f64p)

    code = _lib()(n, m, p(H), p(h), p(A), p(al), p(au), p(xl), p(xu),
                  p(x), p(y), p(ybox), max_iter, tol,
                  ctypes.byref(iters))

    dt = qp.H.dtype
    zero = jnp.zeros((), dt)
    return QPSolution(
        x=jnp.asarray(x, dt), y=jnp.asarray(y[:m], dt),
        y_box=jnp.asarray(ybox, dt),
        status=jnp.asarray(code, jnp.int32),
        iters=jnp.asarray(iters.value, jnp.int32),
        res_prim=zero, res_dual=zero,
        rho=jnp.zeros((m,), dt))
