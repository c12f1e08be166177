"""Feasibility probe: large-data workload (toward the 10k x 5k scale-up)."""
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


def probe(n_objects=2000, n_features=500, n_states=5, n_chains=64, chunk_steps=50):
    t0 = time.perf_counter()
    data = synthetic_data(n_objects=n_objects, n_features=n_features, n_states=n_states,
                          n_families=8, seed=0)
    config = synthetic_config(n_clusters=5, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    jax.block_until_ready(states.clusters)
    print(f"init {n_chains} chains: {time.perf_counter() - t0:.1f}s", flush=True)

    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    t0 = time.perf_counter()
    carry = rt.run_chunk(keys, states, stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    keys2 = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, 1)
    carry = rt.run_chunk(keys2, carry.state, carry.stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    dt = time.perf_counter() - t0
    total = chunk_steps * n_chains
    print(
        f"N={n_objects} F={n_features} chains={n_chains}: steps/sec={total/dt:.0f} "
        f"(step-wall={dt/chunk_steps*1e3:.1f} ms)  lh[0]={float(carry.state.log_lh[0]):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    probe(*args) if args else probe()
