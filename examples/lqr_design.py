"""LQR / CARE / Lyapunov design (reference examples/lqr_test.cpp:26-40 —
6-state, 3-input system — and src/control/lqr.hpp).

The TPU build enables the Newton-Kleinman CARE refinement the reference
left commented out (lqr.hpp:185), so the Riccati residual here is at
solver precision rather than initialisation precision.

Run:  python examples/lqr_design.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# fp64 examples run on CPU by default (TPU fp64 linear algebra is
# unsupported); set POLYMPC_EXAMPLES_PLATFORM=tpu to target the chip
jax.config.update("jax_platforms",
                  os.environ.get("POLYMPC_EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from polympc_tpu.control import lqr, care, lyapunov


def main():
    rng = np.random.default_rng(7)
    n, m = 6, 3
    A = jnp.asarray(rng.normal(size=(n, n)) - 2.0 * np.eye(n))
    B = jnp.asarray(rng.normal(size=(n, m)))
    Q = jnp.eye(n) * jnp.asarray([1.0, 1.0, 5.0, 0.1, 0.1, 0.5])
    R = jnp.eye(m) * jnp.asarray([5.0, 5.0, 0.01])

    K, P = lqr(A, B, Q, R)
    res = A.T @ P + P @ A - P @ B @ jnp.linalg.solve(R, B.T @ P) + Q
    print(f"CARE residual |A'P + PA - PBR^-1B'P + Q| = "
          f"{float(jnp.max(jnp.abs(res))):.2e}")

    # closed loop is stable: eigenvalues of A - BK in the left half plane
    eig = np.linalg.eigvals(np.asarray(A - B @ K))
    print("closed-loop eigenvalue real parts:",
          np.sort(eig.real).round(3))
    assert np.all(eig.real < 0)

    # Lyapunov certificate for the closed loop
    Acl = A - B @ K
    P2 = lyapunov(Acl, Q)
    lres = Acl.T @ P2 + P2 @ Acl + Q
    print(f"Lyapunov residual = {float(jnp.max(jnp.abs(lres))):.2e}")

    # care() directly
    P3 = care(A, B, Q, R)
    print(f"|care(P) - lqr(P)| = {float(jnp.max(jnp.abs(P3 - P))):.2e}")
    print("LQR design OK")


if __name__ == "__main__":
    main()
