"""Probe: throughput vs number of vmapped chains on the TPU."""
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


def probe(n_chains, chunk_steps=200, reps=2):
    data = synthetic_data(n_objects=100, n_features=36, n_states=6, n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)

    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    t_compile = time.perf_counter()
    carry = rt.run_chunk(keys, states, stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    print(f"chains={n_chains:5d}  compile+first-chunk: {time.perf_counter() - t_compile:.1f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(reps):
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(carry.key, i)
        carry = rt.run_chunk(keys, carry.state, carry.stats, ones, ones, chunk_steps)
    jax.block_until_ready(carry.state)
    dt = time.perf_counter() - t0
    total = reps * chunk_steps * n_chains
    print(
        f"chains={n_chains:5d}  steps/sec={total/dt:10.0f}  per-chain={total/dt/n_chains:8.1f}"
        f"  step-wall={dt/(reps*chunk_steps)*1e3:6.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [64, 256, 1024, 4096]
    for n in sizes:
        probe(n)
