"""Benchmark: MCMC throughput on the south_america-shaped workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: ESS/sec/chip — the BASELINE.json north-star metric — of a vmapped
chain ensemble on a synthetic south_america-shaped dataset (100 objects x
36 features x <=6 states, K=3, universal+family confounders). ESS is the
multi-chain effective sample size (Stan-style; penalizes between-chain
disagreement) of the log-posterior trace, measured with the SAME estimator
on the reference sampler's trace (benchmarks/reference_baseline.py).

Baseline: the reference sampler measured on THIS machine via
benchmarks/reference_baseline.py (shimmed numba -> scipy gammaln),
multiplied by a measured numba-headroom margin: profiling shows only
~10.5% of the reference's step time is spent inside the two numba kernels
(the rest is Python/NumPy machinery numba does not accelerate), so even a
10x numba speedup on those kernels bounds the whole-sampler headroom at
~1.10x; we use a conservative 1.25x. See
benchmarks/reference_baseline.json and benchmarks/kernel_fraction.md.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(__file__).replace("bench.py", ".jax_cache_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

# Reference single-core steps/sec measured by benchmarks/reference_baseline.py
REFERENCE_MEASURED_STEPS_PER_SEC = 291.7
# Measured: numba kernels are ~10.5% of reference step time -> headroom
# bound ~1.10x; use 1.25x to stay conservative (benchmarks/kernel_fraction.md)
NUMBA_HEADROOM_MARGIN = 1.25
BASELINE_STEPS_PER_SEC = REFERENCE_MEASURED_STEPS_PER_SEC * NUMBA_HEADROOM_MARGIN

N_CHAINS = 1024
CHUNK_STEPS = 200


def _measure(n_chains: int, chunk_steps: int) -> dict:
    import numpy as np

    from sbayes_tpu.model.model import Model
    from sbayes_tpu.results.ess import multichain_ess
    from sbayes_tpu.sampling.kernel import OperatorStats
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=100, n_features=36, n_states=6, n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)

    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    # Compile + warm-up/equilibration (10 chunks = 2000 steps per chain)
    carry = rt.run_chunk(keys, states, stats, ones, ones, chunk_steps)
    for i in range(9):
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, i)
        carry = rt.run_chunk(keys, carry.state, carry.stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)

    # Timed trace chunks; median of per-chunk times (robust to transient
    # stalls of the remote-device tunnel)
    n_chunks = 10
    times, traces = [], []
    for i in range(n_chunks):
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, 100 + i)
        t0 = time.perf_counter()
        carry, tr = rt._run_chunk_trace(keys, carry.state, carry.stats, ones, ones, chunk_steps)
        jax.block_until_ready(tr)
        times.append(time.perf_counter() - t0)
        traces.append(np.asarray(tr))

    wall = float(np.median(times)) * n_chunks
    trace = np.concatenate(traces, axis=0).T  # (chains, steps)
    ess = multichain_ess(trace)
    return {
        "steps_per_sec": n_chunks * chunk_steps * n_chains / wall,
        "ess": ess,
        "ess_per_sec": ess / wall,
    }


def main():
    baseline_file = Path(__file__).parent / "benchmarks" / "reference_baseline.json"
    baseline = BASELINE_STEPS_PER_SEC
    if baseline_file.exists():
        measured = json.loads(baseline_file.read_text())["steps_per_sec"]
        baseline = measured * NUMBA_HEADROOM_MARGIN

    # The remote-compile tunnel in this environment is occasionally flaky
    # for large batch sizes; guard each attempt with an alarm and fall back
    # to smaller (cached) ensemble sizes rather than hanging the driver.
    import signal

    def attempt(n_chains, timeout_s):
        def _raise(signum, frame):
            raise TimeoutError(f"bench attempt at {n_chains} chains timed out")

        old = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(timeout_s)
        try:
            return _measure(n_chains, CHUNK_STEPS)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    measured, used_chains = None, None
    for n_chains, timeout_s in [(N_CHAINS, 480), (256, 360)]:
        try:
            measured, used_chains = attempt(n_chains, timeout_s), n_chains
            break
        except Exception as e:  # noqa: BLE001 - fall back to the next size
            import sys

            print(f"bench attempt with {n_chains} chains failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if measured is None:
        raise SystemExit("all bench attempts failed")

    # Baseline ESS/sec measured on the reference sampler with the same
    # estimator (benchmarks/reference_baseline.json); margin as for steps/s.
    ref_ess_per_sec = 0.0683
    if baseline_file.exists():
        d = json.loads(baseline_file.read_text())
        ref_ess_per_sec = d.get("ess_per_sec", ref_ess_per_sec)
    baseline_ess = ref_ess_per_sec * NUMBA_HEADROOM_MARGIN

    import sys

    print(f"steps/sec/chip: {measured['steps_per_sec']:.0f} "
          f"({measured['steps_per_sec'] / baseline:.0f}x baseline); "
          f"ensemble multichain ESS {measured['ess']:.0f}", file=sys.stderr)
    print(json.dumps({
        "metric": f"log_posterior_ess_per_sec_per_chip_south_america_shape_{used_chains}chains",
        "value": round(measured["ess_per_sec"], 2),
        "unit": "ESS/sec/chip",
        "vs_baseline": round(measured["ess_per_sec"] / baseline_ess, 1),
    }))


if __name__ == "__main__":
    main()
