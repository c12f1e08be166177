"""Fused-program family-cost attribution at the headline shape (VERDICT r4 #2).

The round-5 bisect showed branch-level probes do NOT predict fused-program
cost (the lane-packed d_ll won every branch probe and lost 4x fused), so
the source-family roofline must be closed at the FUSED level: time the
production chunk with the operator-family weights redistributed —
single-family schedules give each family's pure fused cost, and the
production schedule cross-checks the weighted sum.

    python benchmarks/fused_family_probe.py

Prints per-family fused ms/ensemble-step and the implied schedule
decomposition. Requires the TPU tunnel.
"""
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

SA_CONFIG = Path("/root/reference/experiments/south_america/config.yaml")
N_CHAINS = 1024
CHUNK_STEPS = 200


def build_runtime(weights: dict):
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.runner import SamplerRuntime

    custom = {"results": {"log_operator_step_times": False},
              "mcmc": {"operators": weights}}
    config = SBayesConfig.from_config_file(SA_CONFIG, custom_settings=custom)
    data = Data.from_config(config)
    model = Model(data, config.model)
    return SamplerRuntime(model, config.mcmc, sample_from_prior=False)


def fused_ms(rt, reps=8) -> float:
    from sbayes_tpu.sampling.kernel import OperatorStats

    states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(N_CHAINS))
    ones = jnp.ones(N_CHAINS, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)
    carry = rt.run_chunk(keys, states, stats, ones, ones, CHUNK_STEPS)
    jax.block_until_ready(carry.state)
    times = []
    for i in range(reps):
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, 100 + i)
        t0 = time.perf_counter()
        carry = rt.run_chunk(keys, carry.state, carry.stats, ones, ones, CHUNK_STEPS)
        jax.block_until_ready(carry.state)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / CHUNK_STEPS * 1e3


def main():
    schedules = {
        # production mix (reference defaults 70/10/20)
        "prod": {"clusters": 70.0, "weights": 10.0, "source": 20.0},
        # pure families: every step draws from one family only
        "clusters_only": {"clusters": 1.0, "weights": 0.0, "source": 0.0},
        "source_only": {"clusters": 0.0, "weights": 0.0, "source": 1.0},
        "weights_only": {"clusters": 0.0, "weights": 1.0, "source": 0.0},
    }
    ms = {}
    for name, w in schedules.items():
        rt = build_runtime(w)
        ms[name] = fused_ms(rt)
        print(f"{name:14s}: {ms[name]:6.3f} ms/ensemble-step "
              f"({N_CHAINS * 1e3 / ms[name]:,.0f} chain-steps/s)", flush=True)

    predicted = (0.7 * ms["clusters_only"] + 0.2 * ms["source_only"]
                 + 0.1 * ms["weights_only"])
    print(f"\nweighted sum of pure families: {predicted:.3f} ms/step "
          f"vs measured prod {ms['prod']:.3f} ms/step "
          f"({predicted / ms['prod']:.2f}x)")
    src_share = 0.2 * ms["source_only"] / ms["prod"]
    print(f"source family share of the production step: {src_share:.1%} "
          f"(pure-family cost {ms['source_only']:.3f} ms; clusters "
          f"{ms['clusters_only']:.3f} ms)")


if __name__ == "__main__":
    main()
