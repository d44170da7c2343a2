"""The measurement protocol itself is load-bearing — test it.

Round 1 published physically impossible throughput because its timing loop
trusted an async completion signal (VERDICT.md weak #1).  These tests pin
the fixed protocol's pieces on the CPU backend:

  * fetch_scalar really materializes a value (and propagates NaN poisoning);
  * time_loop returns a sane positive per-iteration time and asserts
    finiteness of the chained output;
  * the MFU roofline guard refuses rates above peak;
  * compiled_flops returns a positive FLOP count for a matmul.
"""

from __future__ import annotations

import numpy as np
import pytest

import bench


def test_fetch_scalar_materializes_value():
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: a * 2)(jnp.arange(4.0))
    assert bench.fetch_scalar(jax, {"out": x}) == 0.0
    assert bench.fetch_scalar(jax, x + 1) == 1.0


def test_time_loop_counts_iterations_and_rejects_nonfinite():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1.0)
    st = {"x": jnp.float32(0.0)}

    def step():
        st["x"] = f(st["x"])
        return st["x"]

    dt = bench.time_loop(jax, step, n_warmup=1, n_iters=5)
    assert dt > 0
    assert float(st["x"]) == 6.0  # warmup + timed iterations all ran

    st["x"] = jnp.float32(np.nan)

    def bad():
        st["x"] = f(st["x"])
        return st["x"]

    with pytest.raises(AssertionError):
        bench.time_loop(jax, bad, n_warmup=0, n_iters=1)


def test_compiled_flops_positive_for_matmul():
    import jax
    import jax.numpy as jnp

    a = jnp.ones((64, 64), jnp.float32)
    f = jax.jit(lambda x: x @ x)
    flops = bench.compiled_flops(jax, f, a)
    # 2*N^3 = 524288 for N=64; cost models vary, but it must be positive
    assert np.isfinite(flops) and flops > 0


def test_mfu_guard_blocks_impossible_rates():
    """bench.check_mfu — the guard bench.main actually calls — must abort on
    MFU > 1 and pass through plausible or unknown (NaN) values."""
    with pytest.raises(SystemExit):
        bench.check_mfu("train_epoch", 3.08)  # round-1's implied MFU
    bench.check_mfu("train_epoch", 0.04)      # plausible: no raise
    bench.check_mfu("train_epoch", float("nan"))  # unknown FLOPs: no raise


def test_baseline_loader_prefers_measured_anchor():
    b = bench.load_measured_baseline()
    assert "ref_train_pairs_per_sec" in b and b["ref_train_pairs_per_sec"] > 0
    assert "protocol" in b
