"""eps_stat x fp64-refine-split sweep for the kite headline pipeline.

The headline bench (bench.py) terminates the fp32 SQP loosely
(eps_stat=1e-2) and leans on the fp64 Newton-KKT refinement for delivered
1e-6 accuracy.  This sweep records the evidence that that split is the
right one (r4 VERDICT weak #5 / task 7): for each inner stopping tolerance
eps_stat in {1e-1, 1e-2, 1e-3} and each refinement scheme in
{2, 3, 4 unconditional iterations, adaptive 2+2-on-64-worst}, it measures

  * solve wall (rollout + fp32 batched SQP, reps timed),
  * certify wall (the fp64 refinement scheme),
  * certified count (KKT <= 1e-6) and certified-throughput/s/chip
    (certified / (solve + certify wall) — the pipeline stages are
    sequential, so component walls sum to the pipeline wall).

Usage: python benchmarks/refine_sweep.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.setrecursionlimit(100000)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from polympc_tpu.basis import Chebyshev, SegmentedBasis
    from polympc_tpu.control.nmpf import augment_ocp
    from polympc_tpu.models import kite_dynamics, kite_output, kite_path
    from polympc_tpu.nlp import SQPSettings
    from polympc_tpu.nlp.refine import refine_solution
    from polympc_tpu.ocp import transcribe, ocp_bounds
    from polympc_tpu.parallel import make_batch_solver
    from polympc_tpu.qp.types import ADMMSettings
    from polympc_tpu.utils import status as st

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    dtype = jnp.float32
    B = 512
    ocp = augment_ocp(lambda x, u: kite_dynamics(x, u), kite_output,
                      kite_path, nx=3, nu=1, ny=2)
    mesh = SegmentedBasis(Chebyshev(5), 2)
    tr = transcribe(ocp, mesh)
    prm = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=dtype)
    bounds = ocp_bounds(tr, ul=[-5.0, -10.0], uu=[5.0, 10.0],
                        xl=[0.0, -np.pi / 2, -np.pi, -100.0, -100.0],
                        xu=[np.pi / 2, np.pi / 2, np.pi, 100.0, 100.0],
                        dtype=dtype)
    nx = tr.ocp.nx

    rng = np.random.default_rng(0)
    s0 = rng.uniform(0.0, 2 * np.pi, B)
    theta0 = np.pi / 6 + 0.2 * np.sin(2 * s0) + rng.normal(0, 0.05, B)
    phi0 = 0.8 * np.cos(s0) + rng.normal(0, 0.05, B)
    gamma0 = rng.uniform(-0.5, 0.5, B)
    x0s = jnp.asarray(
        np.stack([np.clip(theta0, 0.05, 1.5), np.clip(phi0, -1.5, 1.5),
                  gamma0, s0, np.full(B, 0.05)], axis=1), dtype)

    zw = jnp.zeros((tr.nlp.n,), dtype)
    lw = jnp.zeros((tr.nlp.m,), dtype)
    jax.block_until_ready(jax.jit(tr.nlp.lag_hessian)(zw, lw, prm))
    rollout = jax.jit(jax.vmap(lambda x0: tr.rollout_guess(x0, prm)))

    with jax.enable_x64():
        prm64 = tr.params(d=[0.05], t0=0.0, tf=2.0, dtype=jnp.float64)
        bounds64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), bounds)
        sx64 = jnp.asarray(tr.x_scale, jnp.float64)

        def one_refine(x0, z, lam, lam_box, iters, last=False):
            x0s_ = jnp.asarray(x0, jnp.float64) / sx64
            b = bounds64._replace(lbx=bounds64.lbx.at[:nx].set(x0s_),
                                  ubx=bounds64.ubx.at[:nx].set(x0s_))
            return refine_solution(tr.nlp, z, lam, lam_box, b, prm64,
                                   iters=iters, solve_dtype=jnp.float32,
                                   matrix_dtype=jnp.float32,
                                   return_residual=True, return_last=last)

        def make_certify(scheme):
            if scheme == "adaptive":
                @jax.jit
                def certify(x0s, zs, lams, lbs):
                    o = jax.vmap(lambda a, b, c, d: one_refine(
                        a, b, c, d, 2, True))(x0s, zs, lams, lbs)
                    r1, zl, laml, lambl = o[3], o[4], o[5], o[6]
                    _, idx = jax.lax.top_k(r1, 64)
                    o2 = jax.vmap(lambda a, b, c, d: one_refine(
                        a, b, c, d, 2))(x0s[idx], zl[idx], laml[idx],
                                        lambl[idx])
                    return r1.at[idx].set(jnp.minimum(r1[idx], o2[3]))
            else:
                @jax.jit
                def certify(x0s, zs, lams, lbs):
                    return jax.vmap(lambda a, b, c, d: one_refine(
                        a, b, c, d, scheme))(x0s, zs, lams, lbs)[3]
            return certify

    rows = []
    for eps_stat in (1e-1, 1e-2, 1e-3):
        settings = SQPSettings(
            hessian="exact", max_iter=12, reg="mirror",
            eps_prim=1e-3, eps_dual=1e-3, eps_viol=1e-3, eps_stat=eps_stat,
            qp=ADMMSettings(rho=1.0, eps_abs=1e-4, eps_rel=1e-4,
                            max_epochs=3, check_every=50, equil_iters=0,
                            kkt_solver="pallas",
                            structure=tr.bbt_structure(), polish=False))
        solve = make_batch_solver(tr, bounds, prm, settings)
        z0s = rollout(x0s)
        sols = solve(x0s, z0s)
        jax.block_until_ready(sols.x)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            z0s = rollout(x0s)
            sols = solve(x0s, z0s)
            jax.block_until_ready(sols.x)
        solve_wall = (time.perf_counter() - t0) / args.reps

        for scheme in (2, 3, 4, "adaptive"):
            certify = make_certify(scheme)
            with jax.enable_x64():
                kkt = certify(x0s, sols.x, sols.lam, sols.lam_box)
                jax.block_until_ready(kkt)
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    kkt = certify(x0s, sols.x, sols.lam, sols.lam_box)
                    jax.block_until_ready(kkt)
                cert_wall = (time.perf_counter() - t0) / args.reps
            kn = np.asarray(kkt)
            certified = int((kn <= 1e-6).sum())
            wall = solve_wall + cert_wall
            row = {
                "eps_stat": eps_stat, "refine": scheme,
                "solve_wall_s": round(solve_wall, 4),
                "certify_wall_s": round(cert_wall, 4),
                "certified": certified,
                "status_solved": int(
                    (np.asarray(sols.status) == st.SOLVED).sum()),
                "mean_sqp_iters": round(
                    float(np.asarray(sols.iters).mean()), 2),
                "certified_per_s_per_chip": round(
                    certified / wall / max(1, len(jax.devices())), 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n== eps_stat x refine sweep (kite NMPF B=512) ==")
    for r in rows:
        print(f"eps_stat={r['eps_stat']:7.0e} refine={str(r['refine']):>8s}  "
              f"{r['certified_per_s_per_chip']:7.1f} certified/s  "
              f"({r['certified']}/512, solve {r['solve_wall_s']:.3f}s + "
              f"certify {r['certify_wall_s']:.3f}s, "
              f"iters {r['mean_sqp_iters']})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
