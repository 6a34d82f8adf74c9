"""Aux subsystem tests: timing counters and warm-start checkpoint/resume.

The reference times solves by hand with polympc::get_time
(utils/helpers.hpp:60-71) and keeps warm starts only in memory
(sqp_base.hpp:613-615); these cover the TPU-native replacements.
"""
import numpy as np
import jax.numpy as jnp

from polympc_tpu.utils import (
    get_time, Timer, time_fn, save_pytree, load_pytree, status as st,
)


def test_get_time_monotonic():
    a = get_time()
    b = get_time()
    assert b >= a


def test_timer_blocks_on_results():
    x = jnp.ones(128)
    with Timer() as t:
        t.block_on(x * 2.0)
    assert t.elapsed >= 0.0


def test_time_fn_counts_solves():
    f = lambda x: x + 1.0
    stats = time_fn(f, jnp.zeros(4), iters=5, batch=16)
    assert stats.iters == 5 and stats.batch == 16
    assert stats.solves_per_s > 0
    assert "solves/s" in str(stats)


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"z": jnp.arange(6, dtype=jnp.float32),
            "lam": (jnp.ones(2), jnp.zeros(3))}
    path = str(tmp_path / "warm.npz")
    save_pytree(path, tree)
    like = {"z": jnp.zeros(6, jnp.float32),
            "lam": (jnp.zeros(2), jnp.zeros(3))}
    back = load_pytree(path, like)
    np.testing.assert_array_equal(np.asarray(back["z"]), np.arange(6))
    np.testing.assert_array_equal(np.asarray(back["lam"][0]), np.ones(2))


def test_pytree_checkpoint_shape_mismatch(tmp_path):
    path = str(tmp_path / "warm.npz")
    save_pytree(path, jnp.zeros(3))
    try:
        load_pytree(path, jnp.zeros(4))
        assert False, "shape mismatch must raise"
    except ValueError:
        pass


def test_mpc_save_load_state(tmp_path):
    from polympc_tpu.basis import Chebyshev, SegmentedBasis
    from polympc_tpu.control import MPC
    from tests.test_control import robot_ocp

    def build():
        m = MPC(robot_ocp(), SegmentedBasis(Chebyshev(5), 2), t0=0.0, tf=2.0)
        m.set_static_parameters([2.0])
        m.control_bounds([-1.5, -0.75], [1.5, 0.75])
        m.initial_conditions([0.5, 0.5, 0.5])
        m.x_guess([0.5, 0.5, 0.5])
        return m

    hot = build()
    cold_sol = hot.solve()
    assert int(cold_sol.status) == st.SOLVED
    path = str(tmp_path / "mpc_warm.npz")
    hot.save_state(path)

    # a fresh controller resumes from the checkpoint: solves in fewer
    # iterations than the cold solve did
    resumed = build()
    resumed.load_state(path)
    warm_sol = resumed.solve()
    assert int(warm_sol.status) == st.SOLVED
    assert int(warm_sol.iters) <= int(cold_sol.iters)
