"""Probe: per-operator-family step cost (schedule restricted to one family)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from sbayes_tpu.model.model import Model
from sbayes_tpu.sampling.kernel import OperatorStats
from sbayes_tpu.sampling.runner import SamplerRuntime
from sbayes_tpu.testing import synthetic_config, synthetic_data


def probe(family: str, n_chains=256, chunk_steps=200):
    data = synthetic_data(n_objects=100, n_features=36, n_states=6, n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    weights = {"clusters": 0.0, "weights": 0.0, "source": 0.0}
    weights[family] = 1.0
    cfg = config.mcmc.model_copy(update={
        "operators": config.mcmc.operators.model_copy(update=weights)
    })
    model = Model(data, config.model)
    rt = SamplerRuntime(model, cfg, sample_from_prior=False)

    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    carry = rt.run_chunk(keys, states, stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    t0 = time.perf_counter()
    carry = rt.run_chunk(carry.key, carry.state, carry.stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    dt = time.perf_counter() - t0
    print(f"{family:10s}: {dt/chunk_steps*1e3:6.2f} ms/ensemble-step "
          f"({n_chains*chunk_steps/dt:8.0f} steps/s)", flush=True)


if __name__ == "__main__":
    probe(sys.argv[1] if len(sys.argv) > 1 else "clusters")
