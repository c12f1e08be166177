"""Per-branch + fused-chunk step-cost regression guard (VERDICT r4 #6).

Measures, at the headline shape (real south_america, 1024 chains):
  * each operator branch standalone (runner.measure_op_step_times), and
  * the FUSED production chunk (geo_off and geo_on) in ms/ensemble-step —
    the number the headline bench depends on. Round 4 regressed the fused
    geo_off program 4x while every standalone branch stayed flat, so a
    branch-only guard is insufficient: the fused timings are the ones that
    caught it.

Compares against benchmarks/branch_budget.json and exits non-zero when any
entry regresses beyond BUDGET_FACTOR (1.5x). Run with --update to rewrite
the budget from the current measurements (do this only after establishing
the new numbers are a deliberate trade, not a regression).

    python benchmarks/branch_budget.py [--update]

Requires the TPU tunnel; ~2 min with a warm compile cache.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

BUDGET_FILE = Path(__file__).parent / "branch_budget.json"
BUDGET_FACTOR = 1.5
N_CHAINS = 1024
CHUNK_STEPS = 200


def _build_runtime(geo_on: bool):
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.runner import SamplerRuntime

    custom = {"results": {"log_operator_step_times": False}}
    if geo_on:
        custom["model"] = {"prior": {"geo": {
            "type": "cost_based", "rate": 1_000_000.0, "aggregation": "mean",
        }}}
    config = SBayesConfig.from_config_file(
        Path("/root/reference/experiments/south_america/config.yaml"),
        custom_settings=custom)
    data = Data.from_config(config)
    model = Model(data, config.model)
    return SamplerRuntime(model, config.mcmc, sample_from_prior=False)


def _fused_ms_per_step(rt) -> float:
    from sbayes_tpu.sampling.kernel import OperatorStats

    states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(N_CHAINS))
    ones = jnp.ones(N_CHAINS, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)
    carry = rt.run_chunk(keys, states, stats, ones, ones, CHUNK_STEPS)
    jax.block_until_ready(carry.state)  # compile + warm
    times = []
    for i in range(8):
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, 100 + i)
        t0 = time.perf_counter()
        carry = rt.run_chunk(keys, carry.state, carry.stats, ones, ones, CHUNK_STEPS)
        jax.block_until_ready(carry.state)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / CHUNK_STEPS * 1e3
    if ms < 0.1:
        # A 200-step fused chunk cannot run in <20 ms — a tunnel hiccup
        # once returned ~0 for a phase (round-5 session 2); fail loudly
        # instead of recording a nonsense budget entry.
        raise RuntimeError(f"implausible fused chunk timing {ms:.4f} ms/step")
    return ms


def measure() -> dict:
    out = {}
    for geo_on in (False, True):
        rt = _build_runtime(geo_on)
        label = "fused_geo_on" if geo_on else "fused_geo_off"
        out[label] = round(_fused_ms_per_step(rt), 2)
        if not geo_on:
            states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
            keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)
            ones = jnp.ones(N_CHAINS, jnp.float32)
            t = rt.measure_op_step_times(keys, states, ones, ones, n_steps=20)
            for name, ms in zip(rt.op_names, t * 1e3):
                out[f"branch:{name}"] = round(float(ms), 2)
    return out


def main():
    update = "--update" in sys.argv
    current = measure()
    print(json.dumps(current, indent=2))
    if update or not BUDGET_FILE.exists():
        BUDGET_FILE.write_text(json.dumps(
            {"shape": "south_america_real_1024chains",
             "budget_ms": current}, indent=2) + "\n")
        print(f"budget written to {BUDGET_FILE}")
        return
    budget = json.loads(BUDGET_FILE.read_text())["budget_ms"]
    failures = []
    for key, ms in current.items():
        b = budget.get(key)
        if b is not None and ms > BUDGET_FACTOR * b:
            failures.append(f"{key}: {ms:.2f} ms > {BUDGET_FACTOR}x budget {b:.2f} ms")
    for f in failures:
        print("REGRESSION:", f)
    if failures:
        sys.exit(1)
    print(f"all {len(current)} entries within {BUDGET_FACTOR}x of budget")


if __name__ == "__main__":
    main()
