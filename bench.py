"""Headline benchmark: batched kite path-following NMPC solves/s/chip.

BASELINE.json north star: batched kite NMPF at >= 10k SQP-converged solves/s
on a v5e-16 => 625 solves/s/chip, with residual parity to the reference's
Ipopt tolerance 1e-6 (ipopt_interface.hpp:403).  This harness solves B
independent augmented kite OCP instances (random initial conditions around
the path) per jitted call, then refines every solution with fp64
Newton-KKT steps (nlp/refine.py) and certifies the unscaled KKT infinity
norm.  A solve counts iff its certified residual is <= 1e-6 — the
refinement and certification are inside the timed pipeline, so the
headline number is for delivered-at-1e-6 solutions (the certificate is
the delivery criterion; the fp32 solver's own status is reported
separately as extra.status_solved).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "extra": {..., "kkt_residual_max": max certified residual over counted
   solves}}
"""
import json
import sys
import time

import numpy as np

import jax

# x64 is enabled ONLY around the certification pass (jax.enable_x64
# context): a global flag would make fori_loop indices int64 inside the
# fp32 Pallas solve kernels, which Mosaic cannot lower
sys.setrecursionlimit(100000)

import jax.numpy as jnp


def main():
    from polympc_tpu.basis import Chebyshev, SegmentedBasis
    from polympc_tpu.control.nmpf import augment_ocp
    from polympc_tpu.models import kite_dynamics, kite_output, kite_path
    from polympc_tpu.nlp import SQPSettings
    from polympc_tpu.nlp.refine import kkt_residual, refine_solution
    from polympc_tpu.ocp import transcribe, ocp_bounds
    from polympc_tpu.parallel import make_batch_solver
    from polympc_tpu.qp.types import ADMMSettings
    from polympc_tpu.utils import status as st

    dtype = jnp.float32  # TPU-native precision
    B = 512   # throughput sweet spot (measured: 256->1478/s, 512->1930/s,
    # 1024->1747/s per chip; beyond that straggler SQP iterations grow)

    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    prm = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=dtype)
    bounds = ocp_bounds(tr, ul=[-5.0, -10.0], uu=[5.0, 10.0],
                        xl=[0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
                        xu=[np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0],
                        dtype=dtype)
    # reference parity tolerances: SQP 1e-3 (sqp_base.hpp:29-30), inner QP
    # 1e-4 (sqp_base.hpp:85-86)
    # TPU-tuned solver configuration (measured on v5e, B=256..1024):
    #   reg="mirror": Newton-Schulz eigenvalue mirroring — pure batched
    #     matmuls, ~25x faster than the eigh-based "eigen" mode on TPU with
    #     identical convergence (256/256);
    #   kkt_solver="pallas": fused lane-batched factor+iterations epoch,
    #     ~125x faster than the vmapped LU epoch;
    #   3 epochs x 50 iterations: fewest factorisations that keep the inner
    #     QP at 1e-4 (sweep: 8x25=301/s, 4x50=404/s, 3x50=486/s per chip);
    #   max_iter=9: the vmapped while_loop runs to the slowest instance —
    #     mean is ~6 iterations; r5 sweep (max_iter 8..12 with the adaptive
    #     certify): truncating the straggler tail at 9 keeps the certified
    #     count (the fp64 refinement recovers the truncated lanes: only 445
    #     lanes satisfy the fp32 stopping test but 509 certify at 1e-6)
    #     while cutting batch wall ~15% vs 12;
    #   polish=False: the OSQP-style active-set polish (LU + sort per inner
    #     QP solve) cost 80% of the solve in traces and the warm-started SQP
    #     converges identically without it (3x speedup measured).
    #   structure=tr.bbt_structure(): the inner-QP KKT goes through the
    #     block-banded-tridiagonal Pallas kernel instead of the dense
    #     lane-batched epoch kernel (measured: 0.262 -> 0.223 s/batch and
    #     +2 converged instances at B=512)
    settings = SQPSettings(
        hessian="exact", max_iter=9, reg="mirror",
        eps_prim=1e-3, eps_dual=1e-3, eps_viol=1e-3, eps_stat=1e-2,
        qp=ADMMSettings(rho=1.0, eps_abs=1e-4, eps_rel=1e-4,
                        max_epochs=3, check_every=50, equil_iters=0,
                        kkt_solver="pallas", structure=tr.bbt_structure(),
                        polish=False))

    # rollout_guess=True fuses the dynamics-rollout initial guess into the
    # solve program: 2 dispatches per batch (solve, certify) instead of 3 —
    # each dispatch costs ~27 ms on this remote-tunnel backend once a
    # solver executable is live (r5 measurement)
    solve = make_batch_solver(tr, bounds, prm, settings, rollout_guess=True)

    rng = np.random.default_rng(0)
    s0 = rng.uniform(0.0, 2 * np.pi, B)
    theta0 = np.pi / 6 + 0.2 * np.sin(2 * s0) + rng.normal(0, 0.05, B)
    phi0 = 0.8 * np.cos(s0) + rng.normal(0, 0.05, B)
    gamma0 = rng.uniform(-0.5, 0.5, B)
    x0s = jnp.asarray(
        np.stack([np.clip(theta0, 0.05, 1.5), np.clip(phi0, -1.5, 1.5),
                  gamma0, s0, np.full(B, 0.05)], axis=1), dtype)

    # absorb the axon backend's one-time "first hard compile" init cost
    # (observed 1-10 min, paid once per process for the first second-order-AD
    # program) with a tiny unbatched compile, so the big batched compile
    # below is seconds, not minutes
    zw = jnp.zeros((tr.nlp.n,), dtype)
    lw = jnp.zeros((tr.nlp.m,), dtype)
    jax.block_until_ready(jax.jit(tr.nlp.lag_hessian)(zw, lw, prm))


    # fp64 refinement + certification pass (jitted, vmapped, timed): two
    # Newton-KKT steps from the fp32 solution, then the unscaled KKT
    # infinity norm at 1e-6 (the reference's Ipopt tol)
    with jax.enable_x64():
        prm64 = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=jnp.float64)
        bounds64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), bounds)

        # adaptive three-stage fp64 refinement (r5): 2 unconditional
        # Newton-KKT iterations for every lane; 2 more for the 64
        # worst-residual lanes (continuing the non-monotone Newton path
        # from the LAST iterate via return_last); then a heavy restart for
        # the 16 still-worst lanes — iters=10, act_tol=1e-4, solve_ir=6,
        # from the original fp32 point.  The act_tol=1e-4 restart is the
        # r5-diagnosed fix for lanes whose default-1e-3 active-set
        # classification pins an act_tol-marginal constraint to the wrong
        # bound and stalls the Newton contraction at 1e-6..1e-5 (6 of the 8
        # never-certifying r4 lanes certify under it; the 2 remaining lanes
        # carry a genuinely non-stationary fp32 point, stat ~1e-2).
        # Costs: stage 1 dominates (B lanes); stages 2+3 together are ~1/4
        # of one unconditional sweep, vs the r4 scheme's 2 extra
        # unconditional sweeps (-4.9% throughput for the same count)

        @jax.jit
        def certify_(x0s, sols_x, sols_lam, sols_lam_box, bounds64, prm64):
            nx = tr.ocp.nx
            sx64 = jnp.asarray(tr.x_scale, jnp.float64)

            def one(x0, z, lam, lam_box, **kw):
                x0s_ = jnp.asarray(x0, jnp.float64) / sx64
                b = bounds64._replace(lbx=bounds64.lbx.at[:nx].set(x0s_),
                                      ubx=bounds64.ubx.at[:nx].set(x0s_))
                # fp32 Pallas-LDLT inner solves (+fp32 IR sweeps against
                # the factor) + fp64 residuals = mixed-precision iterative
                # refinement; matrix_dtype=f32 evaluates the Lagrangian
                # Hessian in fp32 (it only preconditions the step); the
                # certified residual rides back with the solution
                # (return_residual) so certification costs no extra fp64
                # Jacobian evaluation
                return refine_solution(tr.nlp, z, lam, lam_box, b, prm64,
                                       solve_dtype=jnp.float32,
                                       matrix_dtype=jnp.float32,
                                       return_residual=True, **kw)

            o = jax.vmap(lambda a, b, c, d: one(a, b, c, d, iters=2,
                                                return_last=True))(
                x0s, sols_x, sols_lam, sols_lam_box)
            r1, zl, laml, lambl = o[3], o[4], o[5], o[6]
            _, i2 = jax.lax.top_k(r1, 64)
            o2 = jax.vmap(lambda a, b, c, d: one(a, b, c, d, iters=2))(
                x0s[i2], zl[i2], laml[i2], lambl[i2])
            r = r1.at[i2].set(jnp.minimum(r1[i2], o2[3]))
            _, i3 = jax.lax.top_k(r, 16)
            o3 = jax.vmap(lambda a, b, c, d: one(
                a, b, c, d, iters=10, act_tol=1e-4, solve_ir=6))(
                x0s[i3], sols_x[i3], sols_lam[i3], sols_lam_box[i3])
            return r.at[i3].set(jnp.minimum(r[i3], o3[3]))

        def certify(x0s, sols_x, sols_lam, sols_lam_box):
            return certify_(x0s, sols_x, sols_lam, sols_lam_box,
                            bounds64, prm64)

    # warmup / compile
    sols = solve(x0s)
    with jax.enable_x64():
        kkt = certify(x0s, sols.x, sols.lam, sols.lam_box)
    jax.block_until_ready(kkt)

    # median of per-rep walls: robust to one-off dispatch hiccups over the
    # remote-TPU tunnel (observed once: a rep's block_until_ready returned
    # early and the mean reported an impossible 0.001 s/batch)
    reps = 5
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sols = solve(x0s)
        with jax.enable_x64():
            kkt = certify(x0s, sols.x, sols.lam, sols.lam_box)
        jax.block_until_ready(kkt)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))

    kkt_np = np.asarray(kkt)
    # the delivered-solution criterion is the certificate itself: the fp64
    # Newton-refined KKT infinity norm at the reference's Ipopt tolerance.
    # It is strictly stronger evidence than the fp32 solver's internal
    # stopping heuristic — ~20/512 lanes reach a certified-1e-6 point
    # before the heuristic's relative dual-step/stationarity tests fire
    # (they report MAX_ITER at an already-optimal point); conversely a
    # status=SOLVED lane whose certificate exceeds 1e-6 does NOT count.
    ok = kkt_np <= 1e-6
    status_solved = int((np.asarray(sols.status) == st.SOLVED).sum())
    solved = int(ok.sum())
    solves_per_s = solved / dt
    per_chip = solves_per_s / max(1, len(jax.devices()))

    # north star: 10k solves/s on 16 chips -> 625 /s/chip
    print(json.dumps({
        "metric": "kite_nmpf_certified_1e-6_solves_per_s_per_chip",
        "value": round(per_chip, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / 625.0, 4),
        "extra": {
            "batch": B, "solved": solved,
            "status_solved": status_solved,
            "kkt_residual_max": float(kkt_np[ok].max()) if solved else None,
            "kkt_tol": 1e-6,
            "wall_s_per_batch": round(dt, 4),
            "devices": len(jax.devices()),
            "platform": jax.default_backend(),
            "mean_sqp_iters": float(np.asarray(sols.iters).mean()),
        },
    }))


if __name__ == "__main__":
    main()
