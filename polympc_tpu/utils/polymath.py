"""General math utilities: quaternions, smooth switches, linear-system
analysis.

TPU-native build of the reference's ``polymath`` namespace
(src/polymath.h:25-341 / polymath.cpp): everything is pure ``jnp``
(differentiable, vmappable, jit-safe), replacing the CasADi SX symbolics.
Quaternions are (w, x, y, z) scalar-first, matching the reference's layout.

``LinearSystem`` carries controllability / observability / stabilisability
checks (polymath.h:290-305).  Rank tests use SVD with a relative tolerance;
stabilisability uses the PBH eigenvector test, which replaces the
reference's "stable/unstable modes decomposition" comment with an actual
implementation.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "t1_quat", "t2_quat", "t3_quat", "quat_multiply", "quat_inverse",
    "quat_transform", "heaviside", "deg2rad", "rk4_step_fn",
    "LinearSystem", "controllability_matrix", "observability_matrix",
]


# ---- quaternion algebra (polymath.cpp:20-48) ----

def t1_quat(ang):
    """Unit quaternion for a rotation of -ang about the body x-axis
    (polymath.cpp:20: frame-transform convention, hence the minus)."""
    half = -0.5 * ang
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), jnp.sin(half), z, z])


def t2_quat(ang):
    half = -0.5 * ang
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, jnp.sin(half), z])


def t3_quat(ang):
    half = -0.5 * ang
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)])


def quat_multiply(q1, q2):
    """Hamilton product, scalar-first (polymath.cpp:24-36)."""
    s1, v1 = q1[0], q1[1:4]
    s2, v2 = q2[0], q2[1:4]
    s = s1 * s2 - v1 @ v2
    v = jnp.cross(v1, v2) + s1 * v2 + s2 * v1
    return jnp.concatenate([s[None], v])


def quat_inverse(q):
    """Conjugate (= inverse for unit quaternions, polymath.cpp:38-42)."""
    return jnp.concatenate([q[:1], -q[1:4]])


def quat_transform(q_ba, a_vect):
    """Rotate vector a (frame a) into frame b: Im(q * (0,a) * q^-1)
    (polymath.cpp:44-48)."""
    av = jnp.concatenate([jnp.zeros_like(q_ba[:1]), a_vect])
    return quat_multiply(q_ba, quat_multiply(av, quat_inverse(q_ba)))[1:4]


# ---- scalar helpers ----

def heaviside(x, k: float = 1.0):
    """Smooth heaviside: k / (1 + exp(-4x)) (polymath.cpp:52-55)."""
    return k / (1.0 + jnp.exp(-4.0 * x))


def deg2rad(deg):
    return (jnp.pi / 180.0) * deg


def rk4_step_fn(f, h):
    """Return a one-step RK4 map (x, u) -> x_next for dynamics f(x, u)
    (the jit-traceable analogue of rk4_symbolic, polymath.cpp:57-72)."""
    def step(x, u):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return step


# ---- linear-system analysis (polymath.h:290-305) ----

def controllability_matrix(F, G):
    """[G, FG, ..., F^{n-1}G], shape (n, n*m)."""
    F = jnp.asarray(F)
    G = jnp.asarray(G)
    n = F.shape[0]
    blocks = [G]
    for _ in range(n - 1):
        blocks.append(F @ blocks[-1])
    return jnp.concatenate(blocks, axis=1)


def observability_matrix(F, H):
    """[H; HF; ...; HF^{n-1}], shape (n*p, n)."""
    F = jnp.asarray(F)
    H = jnp.asarray(H)
    n = F.shape[0]
    blocks = [H]
    for _ in range(n - 1):
        blocks.append(blocks[-1] @ F)
    return jnp.concatenate(blocks, axis=0)


def _rank(M, rtol=1e-9):
    s = np.linalg.svd(np.asarray(M, np.float64), compute_uv=False)
    if s.size == 0:
        return 0
    return int(np.sum(s > rtol * s[0]))


@dataclasses.dataclass(frozen=True)
class LinearSystem:
    """xdot = F x + G u, y = H x (polymath.h:290-305)."""
    F: np.ndarray
    G: np.ndarray
    H: np.ndarray | None = None

    def is_controllable(self) -> bool:
        n = np.asarray(self.F).shape[0]
        return _rank(controllability_matrix(self.F, self.G)) == n

    def is_observable(self) -> bool:
        if self.H is None:
            raise ValueError("output map H required for observability")
        n = np.asarray(self.F).shape[0]
        return _rank(observability_matrix(self.F, self.H)) == n

    def is_stabilizable(self) -> bool:
        """PBH: rank [F - lambda I, G] = n for every unstable eigenvalue
        (Re lambda >= 0)."""
        F = np.asarray(self.F, np.float64)
        G = np.asarray(self.G, np.float64)
        n = F.shape[0]
        for lam in np.linalg.eigvals(F):
            if lam.real >= -1e-12:
                M = np.concatenate([F - lam * np.eye(n), G], axis=1)
                if _rank(M) < n:
                    return False
        return True

    def is_detectable(self) -> bool:
        """PBH dual: rank [F - lambda I; H] = n for every unstable mode."""
        if self.H is None:
            raise ValueError("output map H required for detectability")
        F = np.asarray(self.F, np.float64)
        H = np.asarray(self.H, np.float64)
        n = F.shape[0]
        for lam in np.linalg.eigvals(F):
            if lam.real >= -1e-12:
                M = np.concatenate([F - lam * np.eye(n), H], axis=0)
                if _rank(M) < n:
                    return False
        return True
