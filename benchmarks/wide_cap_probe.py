"""Measure the wide operator's cap auto-reject rate at scale.

``gibbsish_sample_cluster_wide_geo`` gathers the changed-object rows into a
static buffer of ``wide_rows_cap`` slots and auto-rejects (symmetric, so
MH-exact) any proposal flipping more objects (operators.py
make_alter_cluster_wide). At N=10k the default cap is N/16 = 625 — this
probe turns the truncation's mixing cost into a number: the distribution of
proposal flip counts (OpResult.step_size, visible even on rejects) and the
fraction of proposals the cap kills, measured on warmed-up states.

    python benchmarks/wide_cap_probe.py [n_objects n_features n_chains]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main(n_objects=10_000, n_features=5_000, n_chains=2, n_probe=50):
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.kernel import OperatorStats
    from sbayes_tpu.sampling.operators import OperatorFactory
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.testing import synthetic_config

    if n_objects * n_features > 1_000_000:
        from sbayes_tpu.testing_scale import synthetic_data_large as make_data

        data = make_data(n_objects=n_objects, n_features=n_features,
                         n_states=5, n_families=10, seed=0,
                         cache_dir="/root/repo/.scale_cache")
    else:
        from sbayes_tpu.testing import synthetic_data

        data = synthetic_data(n_objects=n_objects, n_features=n_features,
                              n_states=5, n_families=10, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc)

    # warm the states up a little so cluster shapes are posterior-ish
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    t0 = time.perf_counter()
    carry = rt.run_chunk(keys, states, stats, ones, ones, 200)
    jax.block_until_ready(carry.state)
    print(f"warmup 200 steps x {n_chains} chains: {time.perf_counter()-t0:.1f}s",
          flush=True)

    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    factory = OperatorFactory(cond)
    cap = factory.wide_rows_cap
    wide = jax.jit(jax.vmap(factory.make_alter_cluster_wide(consider_geo=False)))

    flips = []
    state = carry.state
    for s in range(n_probe):
        ks = jax.random.split(jax.random.PRNGKey(100 + s), n_chains)
        res = wide(ks, state)
        flips.append(np.asarray(res.step_size))
    flips = np.concatenate(flips)
    sizes = np.asarray(carry.state.clusters.sum(-1))
    print(f"wide_rows_cap = {cap} (N = {model.consts.N})")
    print(f"cluster sizes across chains: min={sizes.min()} "
          f"median={np.median(sizes):.0f} max={sizes.max()}")
    print(f"proposal flip counts over {flips.size} proposals: "
          f"p50={np.percentile(flips, 50):.0f} p90={np.percentile(flips, 90):.0f} "
          f"max={flips.max():.0f}")
    print(f"cap auto-reject rate (flips > {cap}): {(flips > cap).mean():.3f}",
          flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
