"""Quasi-Newton Hessian updates and regularisation, pure JAX.

Replaces bfgs.hpp:23-52 (damped BFGS, Nocedal Procedure 18.2),
sr1.hpp:22-36 (safeguarded SR1), the reference's sparsity-preserving
block-BFGS for collocation NLPs (continuous_ocp.hpp:2304-2431) and the
per-test hessian-regularisation hooks (sqp_base.hpp:317,
tests/control/mpc_wrapper_test.cpp:90-118).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from polympc_tpu.utils.solver_utils import block_diag_scatter

__all__ = [
    "bfgs_update", "sr1_update", "regularize",
    "BlockHessian", "block_hessian_identity", "block_hessian_matvec",
    "block_bfgs_update", "assemble_block_hessian",
]


def bfgs_update(B, s, y):
    """Damped BFGS update keeping B positive definite.

    theta damps y toward B s when the curvature condition s'y >= 0.2 s'Bs
    fails (Nocedal & Wright, Procedure 18.2).  Degenerate steps (s ~ 0)
    leave B unchanged.
    """
    Bs = B @ s
    sBs = s @ Bs
    sy = s @ y
    theta = jnp.where(sy >= 0.2 * sBs, 1.0,
                      0.8 * sBs / jnp.maximum(sBs - sy, 1e-16))
    r = theta * y + (1.0 - theta) * Bs
    sr = s @ r
    ok = (sBs > 1e-14) & (sr > 1e-14)
    B_new = B - jnp.outer(Bs, Bs) / jnp.maximum(sBs, 1e-16) \
        + jnp.outer(r, r) / jnp.maximum(sr, 1e-16)
    return jnp.where(ok, B_new, B)


def sr1_update(B, s, y):
    """Safeguarded symmetric-rank-1 update (Nocedal & Wright eq. 6.24):
    skip when |s'(y - Bs)| < 1e-6 ||s|| ||y - Bs||."""
    d = y - B @ s
    sd = s @ d
    ok = jnp.abs(sd) >= 1e-6 * jnp.linalg.norm(s) * jnp.linalg.norm(d) + 1e-16
    B_new = B + jnp.outer(d, d) / jnp.where(ok, sd, 1.0)
    return jnp.where(ok, B_new, B)


class BlockHessian(NamedTuple):
    """Compact storage of a collocation-structured quasi-Newton Hessian:
    node-diagonal (xx, uu, xu) blocks plus the dense parameter arrow —
    exactly the sparsity pattern the reference's block-BFGS touches
    (continuous_ocp.hpp:2304-2431).  Memory is N*(nx^2+nu^2+nx*nu) +
    (N*(nx+nu))*np + np^2 floats instead of the O(n^2) dense matrix, so the
    update scales linearly with horizon length."""
    xx: jnp.ndarray   # (N, nx, nx)
    uu: jnp.ndarray   # (N, nu, nu)
    xu: jnp.ndarray   # (N, nx, nu)
    ap: jnp.ndarray   # (N*(nx+nu), np)  all-variables x parameters column
    pp: jnp.ndarray   # (np, np)


def block_hessian_identity(N: int, nx: int, nu: int, np_: int,
                           dtype=jnp.float64) -> BlockHessian:
    """B0 = I in block storage."""
    return BlockHessian(
        xx=jnp.tile(jnp.eye(nx, dtype=dtype)[None], (N, 1, 1)),
        uu=jnp.tile(jnp.eye(nu, dtype=dtype)[None], (N, 1, 1)),
        xu=jnp.zeros((N, nx, nu), dtype),
        ap=jnp.zeros((N * (nx + nu), np_), dtype),
        pp=jnp.eye(np_, dtype=dtype))


def _split_nodes(v, N, nx, nu):
    """z-ordered vector -> (vx (N,nx), vu (N,nu), vp (np,))."""
    vx = v[:N * nx].reshape(N, nx)
    vu = v[N * nx:N * (nx + nu)].reshape(N, nu)
    return vx, vu, v[N * (nx + nu):]


def block_hessian_matvec(B: BlockHessian, s, N: int, nx: int, nu: int):
    """v = B s without materialising the dense matrix."""
    sx, su, sp = _split_nodes(s, N, nx, nu)
    vx = jnp.einsum("kij,kj->ki", B.xx, sx) + jnp.einsum(
        "kij,kj->ki", B.xu, su)
    vu = jnp.einsum("kji,kj->ki", B.xu, sx) + jnp.einsum(
        "kij,kj->ki", B.uu, su)
    va = jnp.concatenate([vx.reshape(-1), vu.reshape(-1)])
    if B.pp.shape[0]:
        sa = s[:N * (nx + nu)]
        va = va + B.ap @ sp
        vp = B.ap.T @ sa + B.pp @ sp
        return jnp.concatenate([va, vp])
    return va


def block_bfgs_update(B: BlockHessian, s, y, N: int, nx: int, nu: int
                      ) -> BlockHessian:
    """Sparsity-preserving damped BFGS (continuous_ocp.hpp:2304-2431):
    the *global* damped rank-2 update  -vv'/s'v + rr'/s'r  (v = Bs,
    r = theta*y + (1-theta)*v) restricted to the node-diagonal blocks and
    the parameter arrow.  Degenerate steps leave B unchanged."""
    v = block_hessian_matvec(B, s, N, nx, nu)
    sBs = s @ v
    sy = s @ y
    theta = jnp.where(sy >= 0.2 * sBs, 1.0,
                      0.8 * sBs / jnp.maximum(sBs - sy, 1e-16))
    r = theta * y + (1.0 - theta) * v
    sr = s @ r
    ok = (sBs > 1e-14) & (sr > 1e-14)
    ci = jnp.where(ok, 1.0 / jnp.maximum(sBs, 1e-16), 0.0)
    cr = jnp.where(ok, 1.0 / jnp.maximum(sr, 1e-16), 0.0)

    vx, vu, vp = _split_nodes(v, N, nx, nu)
    rx, ru, rp = _split_nodes(r, N, nx, nu)
    upd = lambda a, b: cr * jnp.einsum("ki,kj->kij", a[0], a[1]) \
        - ci * jnp.einsum("ki,kj->kij", b[0], b[1])
    xx = B.xx + upd((rx, rx), (vx, vx))
    uu = B.uu + upd((ru, ru), (vu, vu))
    xu = B.xu + upd((rx, ru), (vx, vu))
    if B.pp.shape[0]:
        va = v[:N * (nx + nu)]
        ra = r[:N * (nx + nu)]
        ap = B.ap + cr * jnp.outer(ra, rp) - ci * jnp.outer(va, vp)
        pp = B.pp + cr * jnp.outer(rp, rp) - ci * jnp.outer(vp, vp)
    else:
        ap, pp = B.ap, B.pp
    return BlockHessian(xx=xx, uu=uu, xu=xu, ap=ap, pp=pp)


def assemble_block_hessian(B: BlockHessian, N: int, nx: int, nu: int):
    """Dense (n, n) matrix from block storage (for dense QP backends)."""
    XX = block_diag_scatter(B.xx)
    UU = block_diag_scatter(B.uu)
    XU = block_diag_scatter(B.xu)
    top = jnp.concatenate([XX, XU], axis=1)
    mid = jnp.concatenate([XU.T, UU], axis=1)
    H = jnp.concatenate([top, mid], axis=0)
    if B.pp.shape[0]:
        H = jnp.block([[H, B.ap], [B.ap.T, B.pp]])
    return H


def regularize(H, mode: str, eps: float):
    """Make H safely positive definite for the QP subproblem.

    "gershgorin": shift by the most negative Gershgorin disc bound.
    "eigen": mirror negative eigenvalues (|lambda|, floored at eps) — the
    scheme the reference's tests implement by hand
    (mpc_wrapper_test.cpp:90-118).
    """
    if mode == "none":
        return H
    if mode == "gershgorin":
        d = jnp.diagonal(H)
        radii = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(d)
        lower = jnp.min(d - radii)
        shift = jnp.maximum(0.0, -lower + eps)
        return H + shift * jnp.eye(H.shape[0], dtype=H.dtype)
    if mode in ("mirror", "clip"):
        # Newton-Schulz matrix-sign iteration: |H| = sign(H) H with sign
        # computed from X <- 1.5 X - 0.5 X^3 — pure batched matmuls, ~25x
        # faster than eigh on TPU where the MXU crushes small-matrix
        # products and eigh is iterative/scalar.
        #   "mirror": |H| + ridge — negative eigenvalues flipped positive,
        #             the same semantics as "eigen" (and the reference's
        #             hand-rolled regulariser, mpc_wrapper_test.cpp:90-118);
        #   "clip":   (H + |H|)/2 + ridge — the PSD-cone projection
        #             (negative curvature directions flattened to the
        #             ridge), which takes more gradient-like steps through
        #             indefinite regions.
        Hs = 0.5 * (H + H.T)
        n = Hs.shape[0]
        eye = jnp.eye(n, dtype=Hs.dtype)
        # Newton-Schulz converges only for ||X0||_2 < sqrt(3): the scaling
        # must be a GUARANTEED spectral-norm upper bound.  (A power-iteration
        # estimate is tighter but can undershoot — on the race-car Hessian
        # it silently diverged the sign iteration to NaN, which froze the
        # whole SQP because every QP step got rejected.)  For symmetric Hs,
        # both the max-abs-row-sum norm and the Frobenius norm bound the
        # spectral norm from above; take the smaller.
        nrm_inf = jnp.max(jnp.sum(jnp.abs(Hs), axis=1))
        nrm_fro = jnp.sqrt(jnp.sum(Hs * Hs))
        nrm = jnp.maximum(jnp.minimum(nrm_inf, nrm_fro), 1e-12)
        X = Hs / (1.01 * nrm)
        for _ in range(40):
            X = 1.5 * X - 0.5 * (X @ X) @ X
        absH = 0.5 * ((X @ Hs) + (X @ Hs).T)   # symmetrise |H|
        Hm = absH if mode == "mirror" else 0.5 * (Hs + absH)
        # floor: NS leaves near-zero eigenvalues near zero (sign is slow
        # there); a relative ridge keeps the QP well conditioned
        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(Hs))), 1.0)
        Hm = Hm + (eps * scale) * eye
        # belt-and-braces: if the sign iteration still failed (pathological
        # input), fall back to the Gershgorin shift rather than poisoning
        # the QP with NaNs
        d = jnp.diagonal(Hs)
        radii = jnp.sum(jnp.abs(Hs), axis=1) - jnp.abs(d)
        shift = jnp.maximum(0.0, -jnp.min(d - radii) + eps * scale)
        gersh = Hs + shift * eye
        return jnp.where(jnp.all(jnp.isfinite(Hm)), Hm, gersh)
    if mode == "eigmin":
        # shift by an estimate of the most-negative eigenvalue from power
        # iterations on (c I - H): pure batched matvecs (MXU-friendly), no
        # eigh.  APPROXIMATE by construction: a power-iteration Rayleigh
        # quotient can overestimate lambda_min when the bottom of the
        # spectrum is clustered, leaving the result slightly indefinite
        # (measured <= ~2% of ||H|| on adversarial random matrices).  The
        # SQP tolerates that — non-finite/diverged QP steps are rejected
        # per iteration — so this mode trades a strict PD guarantee for
        # matvec-only cost; use "mirror"/"eigen"/"gershgorin" when the
        # guarantee matters.
        Hs = 0.5 * (H + H.T)
        n = Hs.shape[0]
        d = jnp.diagonal(Hs)
        # phase 1: spectral-norm estimate by power iteration on H^2, so the
        # shift c hugs lambda_max.  (The Gershgorin bound used previously
        # inflates c by up to the row sums, which compresses (cI - H)'s
        # relative gaps and stalls phase 2 — measured: 16 iterations from a
        # constant start left lambda_min overestimated by half the spectrum
        # width on random indefinite matrices, returning an INDEFINITE
        # "regularised" Hessian.)
        idx = jnp.arange(n, dtype=Hs.dtype)
        v = jnp.cos(idx * 1.7) + 0.3        # deterministic, unaligned start
        for _ in range(12):
            v = Hs @ (Hs @ v)
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        nrm2 = jnp.sqrt(jnp.maximum(
            jnp.linalg.norm(Hs @ (Hs @ v)), 1e-30))
        c = 1.05 * nrm2
        # phase 2: power iteration on (cI - H) -> dominant eigenvalue is
        # c - lambda_min with healthy gap ratios now that c ~ ||H||
        w = jnp.sin(idx * 2.3) + 0.2
        for _ in range(20):
            w = c * w - Hs @ w
            w = w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        lam_min = w @ (Hs @ w)              # Rayleigh quotient ~ lambda_min
        scale = jnp.maximum(jnp.max(jnp.abs(d)), 1.0)
        # 1.1 safety on the negative part: the Rayleigh quotient only ever
        # OVERestimates lambda_min, so widen the shift slightly
        shift = 1.1 * jnp.maximum(0.0, -lam_min) + eps * scale
        return Hs + shift * jnp.eye(n, dtype=Hs.dtype)
    if mode == "ridge":
        # fixed relative ridge: cheapest TPU option (no eigh, no row sums);
        # right when H is already near-PSD (tracking costs, Gauss-Newton)
        Hs = 0.5 * (H + H.T)
        shift = eps * jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(Hs))), 1.0)
        return Hs + shift * jnp.eye(H.shape[0], dtype=H.dtype)
    if mode == "eigen":
        w, V = jnp.linalg.eigh(0.5 * (H + H.T))
        # relative floor: an absolute floor leaves the QP catastrophically
        # ill-conditioned when ||H|| is large
        floor = eps * jnp.maximum(jnp.max(jnp.abs(w)), 1.0)
        w = jnp.maximum(jnp.abs(w), floor)
        return (V * w) @ V.T
    raise ValueError(f"unknown regularisation mode {mode!r}")
