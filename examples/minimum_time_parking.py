"""Minimum-time valet parking (reference tests/control/minimal_time_test.cpp
+ valet_parking_mpc_test.cpp:183-239).

The horizon length itself is the free parameter p0 (time scaling): dynamics
are multiplied by p0 on a fixed [0, 1] horizon and the Mayer term is p0 —
pure minimum time. The reference's parking test customises the SQP with a
Fletcher-Leyffer filter line search (valet_parking_mpc_test.cpp:109-158);
here both the filter and the default l1-merit globalisation solve it and
must agree on the minimum time.

Run:  python examples/minimum_time_parking.py
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

import numpy as np

from polympc_tpu.basis import Chebyshev, SegmentedBasis
from polympc_tpu.control import MPC
from polympc_tpu.models import parking_ocp
from polympc_tpu.nlp import SQPSettings
from polympc_tpu.qp.types import ADMMSettings
from polympc_tpu.utils import status as st


def build(line_search):
    # setup from minimal_time_test.cpp:146-186: wheelbase 1, +-0.05 final
    # box, p0 in [0, 10] with guess 0.5 ("very important" per the test)
    settings = SQPSettings(
        hessian="exact", max_iter=100, line_search=line_search,
        qp=ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_epochs=40))
    mpc = MPC(parking_ocp(), SegmentedBasis(Chebyshev(5), 2),
              t0=0.0, tf=1.0, settings=settings)
    mpc.set_static_parameters([1.0])                  # wheelbase
    mpc.control_bounds([-1.5, -0.75], [1.5, 0.75])
    mpc.parameters_bounds([0.0], [10.0])              # time scaling p0
    mpc.initial_conditions([1.5, 0.5, 0.5])           # park at the origin
    mpc.final_state_bounds([-0.05, -0.05, -0.05], [0.05, 0.05, 0.05])
    mpc.x_guess([1.5, 0.5, 0.5])
    mpc.p_guess([0.5])
    return mpc


def main():
    times = {}
    for ls in ("filter", "merit"):
        mpc = build(ls)
        sol = mpc.solve()
        times[ls] = float(mpc.solution_p()[0])
        print(f"SQP+{ls:6s}: {st.status_name(int(sol.status))} "
              f"in {int(sol.iters)} iters, "
              f"parking time = {times[ls]:.4f} s")
        assert int(sol.status) == st.SOLVED
        Xf = np.asarray(mpc.solution_x())[-1]
        assert np.all(np.abs(Xf) <= 0.05 + 1e-4), "must reach the origin box"

    assert abs(times["filter"] - times["merit"]) < 0.05, \
        "globalisations must agree on the minimum time"
    print(f"final state = {Xf.round(5)}  (target: +-0.05 box at origin)")


if __name__ == "__main__":
    main()
