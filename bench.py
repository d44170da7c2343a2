#!/usr/bin/env python
"""Throughput benchmark on the real TPU chip — with built-in honesty guards.

Measures the PRODUCTION data path — device-resident dataset, scanned-epoch
training — at the Charades parity shapes (B=16, T=64, vdim=1024, dim=128,
heads=8, 2 attn layers; reference configs/charades/SeqPAN.yaml):

* headline: sustained train pairs/s over full scanned epochs (125 batches
  of 16 = a 2000-sample split per dispatch);
* extras: isolated per-step latency and the B=256 MC-dropout inference
  step (clean + 2 stochastic forwards) used by the AL train-set sweep.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol (fixes the round-1 artifact, VERDICT.md "weak #1"):

1. Timing ends only after ``jax.device_get`` of the LAST iteration's output.
   Every iteration's state is donated into the next, so the final fetch has a
   data dependency on all prior compute — the tunneled "axon" platform's
   ``block_until_ready`` does NOT reliably synchronize, a value fetch does.
   The one ~100 ms tunnel round-trip the fetch adds is measured separately
   (``null_roundtrip_ms``) and reported, not hidden.
2. A roofline guard computes FLOPs/step from XLA's own
   ``compile().cost_analysis()`` and FAILS the benchmark if the implied MFU
   exceeds 1.0 (a physically impossible number must never be published).
   The MFU of every reported rate is included in the output.
3. ``vs_baseline`` divides by a MEASURED reference throughput: the reference
   TF1 trainer run in this same container (tools/bench_reference.py writes
   results/reference_baseline.json).  The reference repo publishes no
   numbers and no GPU is available here, so the measured CPU anchor plus the
   explicit protocol string replaces round 1's guessed 400 pairs/s.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# bf16 peak of one TPU v5e chip (the bench target hardware).  Used only for
# the MFU sanity guard; rates are reported raw.
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5e": 197e12}
DEFAULT_PEAK = 197e12

BASELINE_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "results", "reference_baseline.json")


def load_measured_baseline() -> dict:
    """Measured reference anchor (tools/bench_reference.py).  Falls back to
    the documented estimate if the measurement has not been run here."""
    try:
        with open(BASELINE_JSON) as f:
            return json.load(f)
    except OSError:
        return {
            "ref_train_pairs_per_sec": 400.0,
            "protocol": "ESTIMATE ONLY (tools/bench_reference.py not run): "
                        "TF1 feed-dict trainers of this size typically reach "
                        "~25 steps/s x B=16 on a datacenter GPU",
            "measured": False,
        }


def build(n_samples=2000, T=64, W=14, C=12, V=1024, dim=128, heads=8,
          layers=2, vocab=8000, chars=100):
    import jax

    from hual_tpu.models.seqpan import SeqPAN
    from hual_tpu.ops.optim import make_optimizer
    from hual_tpu.runtime.steps import gather_batch

    rng = np.random.default_rng(0)
    N = n_samples
    s = rng.integers(0, T // 2, N).astype(np.int32)
    data_np = {
        "features": rng.normal(size=(N, T, V)).astype(np.float32),
        "feat_rows": np.arange(N, dtype=np.int32),
        "v_len": np.full(N, T, np.int32),
        "word_ids": rng.integers(1, vocab, size=(N, W)).astype(np.int32),
        "char_ids": rng.integers(0, chars, size=(N, W, C)).astype(np.int32),
        "duration": rng.uniform(15, 40, size=N).astype(np.float32),
        "s_ind": s,
        "e_ind": np.minimum(s + rng.integers(1, T // 2, N), T - 1).astype(np.int32),
    }
    data = {k: jax.device_put(v) for k, v in data_np.items()}
    wv = jax.device_put(rng.normal(size=(vocab, 300)).astype(np.float32))

    model = SeqPAN(dim=dim, num_heads=heads, attn_layer=layers, max_vlen=T,
                   word_dim=300, char_dim=50, num_chars=chars)
    sel0 = np.arange(16, dtype=np.int32)
    batch0 = jax.jit(lambda d, s: gather_batch(d, s, True))(data, sel0)
    params = model.init({"params": jax.random.key(0)}, batch0, wv, 0.0,
                        batch0["match_labels"], deterministic=True)
    tx = make_optimizer(1.0, 0.01)
    return jax, model, tx, data, wv, params


def fetch_scalar(jax, out):
    """Force a real device->host value fetch of one element of `out`
    (block_until_ready on the tunneled axon platform does not reliably
    synchronize; transferring bytes does)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf)).reshape(-1)[0]


def time_loop(jax, fn, n_warmup, n_iters):
    """Mean seconds per call.  fn() must thread its own state so call i+1
    depends on call i; timing ends after a VALUE FETCH of the final output,
    which (through the donated-state data dependency) awaits every prior
    iteration."""
    out = None
    for _ in range(n_warmup):
        out = fn()
    if out is not None:
        fetch_scalar(jax, out)  # sync: warmup fully done
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn()
    val = fetch_scalar(jax, out)
    dt = (time.perf_counter() - t0) / n_iters
    assert np.isfinite(val), f"non-finite benchmark output: {val}"
    return dt


def compiled_flops(jax, jitted, *args) -> float:
    """FLOPs of one call, from XLA's own cost model."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return float("nan")


def device_peak_flops(jax) -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in PEAK_FLOPS.items():
        if key in kind:
            return peak
    return DEFAULT_PEAK


def check_mfu(name: str, mfu: float) -> None:
    """Honesty guard: refuse to publish a rate whose implied MFU exceeds the
    hardware roofline (round 1 published one; PROFILING.md §1).  Raises
    SystemExit so the driver records a failed bench instead of a bogus one."""
    if np.isfinite(mfu) and mfu > 1.0:
        raise SystemExit(
            f"BENCH SELF-CHECK FAILED: {name} implies MFU {mfu:.2f} > 1 "
            f"(> roofline). The measurement did not synchronize; refusing "
            f"to publish an impossible number.")


def measure_null_roundtrip(jax, n=5) -> float:
    """Median seconds for one tiny device->host fetch (tunnel latency)."""
    x = jax.device_put(np.zeros((8,), np.float32))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update("jax_compilation_cache_dir",
                           os.path.expanduser("~/.cache/hual_tpu_xla"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # production per-stream PRNG defaults (TrainConfig.rng_impl /
    # infer_rng_impl): rbg for BOTH the train step and the infer sweep
    # — both directions measured on the real chip (PROFILING.md §3)
    train_rng_impl = os.environ.get("HUAL_BENCH_RNG", "rbg")
    infer_rng_impl = os.environ.get("HUAL_BENCH_INFER_RNG", "rbg")

    import jax.numpy as jnp

    from hual_tpu.runtime.steps import (make_infer_step_indexed,
                                        make_train_epoch_indexed,
                                        make_train_step_indexed)

    jax, model, tx, data, wv, params = build()
    B, N = 16, 2000
    lr = jnp.float32(1e-4)
    rng = jax.random.key(0, impl=train_rng_impl)
    infer_rng = jax.random.key(0, impl=infer_rng_impl)
    peak = device_peak_flops(jax)
    null_rt = measure_null_roundtrip(jax)

    # isolated per-step latency
    step = jax.jit(make_train_step_indexed(model, tx, 1.0, 0.2),
                   donate_argnums=(0, 1))
    sels = [jax.device_put(np.random.default_rng(i).integers(
        0, N, B).astype(np.int32)) for i in range(64)]
    # independent state copies up front: both paths donate their state
    p_step = jax.tree.map(jnp.copy, params)
    p_epoch = jax.tree.map(jnp.copy, params)
    o_step = tx.init(params)
    o_epoch = tx.init(params)

    step_flops = compiled_flops(jax, step, p_step, o_step, data, sels[0], wv,
                                lr, rng)
    st = {"p": p_step, "o": o_step, "i": 0}

    def step_once():
        st["i"] += 1
        st["p"], st["o"], m = step(st["p"], st["o"], data,
                                   sels[st["i"] % 64], wv, lr, rng)
        return m["loss"]

    step_dt = time_loop(jax, step_once, n_warmup=3, n_iters=50)

    # headline: full scanned epochs (N/B batches per dispatch)
    epoch_fn = jax.jit(make_train_epoch_indexed(model, tx, 1.0, 0.2),
                       donate_argnums=(0, 1))
    perm = np.random.default_rng(7).permutation(N).astype(np.int32)
    epoch_sels = jax.device_put(perm.reshape(N // B, B))
    st2 = {"p": p_epoch, "o": o_epoch}

    def epoch_once():
        st2["p"], st2["o"], losses, ious = epoch_fn(
            st2["p"], st2["o"], data, epoch_sels, wv, lr, rng, jnp.int32(0))
        return losses

    epoch_dt = time_loop(jax, epoch_once, n_warmup=2, n_iters=10)
    train_pps = N / epoch_dt
    # NB: cost_analysis counts a lax.scan body ONCE, so the epoch program's
    # reported flops understate by n_batches; use the isolated step's flops
    # (same body) x the number of scanned steps.
    epoch_flops = step_flops * (N // B)
    train_mfu = (epoch_flops / epoch_dt) / peak if np.isfinite(step_flops) \
        else float("nan")

    # AL sweep inference step at B=256 (threaded state: reuse updated params)
    infer_step = jax.jit(make_infer_step_indexed(model, 0.5))
    sel_big = jax.device_put(np.arange(256, dtype=np.int32))
    infer_flops = compiled_flops(jax, infer_step, st2["p"], data, sel_big,
                                 wv, infer_rng)
    carry = {"x": jnp.zeros((), jnp.int32)}

    def infer_once():
        # fold the previous output into the RNG so call i+1 has a data
        # dependency on call i (no donated state here; the dependency chain
        # is what makes the final fetch await every iteration)
        out = infer_step(st2["p"], data, sel_big, wv,
                         jax.random.fold_in(infer_rng, carry["x"]))
        carry["x"] = (jnp.sum(out["ious"]) * 0).astype(jnp.int32)
        return out["ious"]

    infer_dt = time_loop(jax, infer_once, n_warmup=3, n_iters=20)
    infer_mfu = (infer_flops / infer_dt) / peak if np.isfinite(infer_flops) \
        else float("nan")

    # the PRODUCTION AL sweep: scanned multi-batch inference in one dispatch
    # (robust against per-dispatch jitter that dominates single-step timing)
    # at the SHIPPED infer batch size: B=96, the measured optimum of the
    # {32..1024} x {folded,sequential} grid (results/sweep_ablation*.json)
    from hual_tpu.runtime.steps import (make_infer_step_indexed,
                                        make_infer_sweep_indexed)
    SWEEP_B, SWEEP_STEPS = 96, 21
    sweep = jax.jit(make_infer_sweep_indexed(model, 0.5))
    sweep_step = jax.jit(make_infer_step_indexed(model, 0.5))
    sweep_sels = jax.device_put(
        np.arange(SWEEP_STEPS * SWEEP_B, dtype=np.int32)
        .reshape(SWEEP_STEPS, SWEEP_B) % N)
    sweep_flops = compiled_flops(jax, sweep_step, st2["p"], data,
                                 sweep_sels[0], wv, infer_rng)
    carry2 = {"x": jnp.zeros((), jnp.int32)}

    def sweep_once():
        out = sweep(st2["p"], data, sweep_sels, wv,
                    jax.random.fold_in(infer_rng, carry2["x"]))
        carry2["x"] = (jnp.sum(out["ious"]) * 0).astype(jnp.int32)
        return out["ious"]

    sweep_dt = time_loop(jax, sweep_once, n_warmup=2, n_iters=10)
    sweep_pps = SWEEP_STEPS * SWEEP_B / sweep_dt
    sweep_mfu = (sweep_flops * SWEEP_STEPS / sweep_dt) / peak \
        if np.isfinite(sweep_flops) else float("nan")

    # ---------------- honesty guards -----------------------------------
    for name, mfu in [("train_epoch", train_mfu), ("infer_b256", infer_mfu),
                      ("infer_sweep", sweep_mfu)]:
        check_mfu(name, mfu)
    baseline = load_measured_baseline()
    ref_pps = float(baseline.get("ref_train_pairs_per_sec", 400.0))

    result = {
        "metric": "seqpan_charades_sustained_train_pairs_per_sec_per_chip",
        "value": round(train_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(train_pps / ref_pps, 2),
        "extra": {
            "scanned_epoch_ms": round(epoch_dt * 1e3, 2),
            "isolated_step_ms": round(step_dt * 1e3, 3),
            "train_flops_per_step_g": round(step_flops / 1e9, 2)
            if np.isfinite(step_flops) else None,
            "train_mfu": round(train_mfu, 4) if np.isfinite(train_mfu) else None,
            "infer_b256_step_ms": round(infer_dt * 1e3, 3),
            "infer_b256_pairs_per_sec": round(256 / infer_dt, 1),
            "infer_mfu": round(infer_mfu, 4) if np.isfinite(infer_mfu) else None,
            "infer_scanned_sweep_pairs_per_sec": round(sweep_pps, 1),
            "infer_scanned_sweep_mfu": round(sweep_mfu, 4)
            if np.isfinite(sweep_mfu) else None,
            "infer_sweep_batch_size": SWEEP_B,
            "rng_impls": {"train": train_rng_impl, "infer": infer_rng_impl},
            "null_roundtrip_ms": round(null_rt * 1e3, 2),
            "peak_flops_assumed": peak,
            "batch_size": B,
            "baseline_protocol": baseline.get("protocol", ""),
            "baseline_measured": bool(baseline.get("measured", False)),
            "ref_train_pairs_per_sec": ref_pps,
            "path": "device-resident scanned-epoch (production loop); timing "
                    "ends at a device_get of the final donated-state output",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
