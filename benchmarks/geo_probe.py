"""Attribute the geo_on throughput gap (bench.py: 163k vs 103k steps/s)
to its components on the real south_america workload, 1024 vmapped chains.

Times, per evaluation over the whole 1024-chain batch:
  - masked-Prim MST (`skeleton_triple`): the carried-aggregate update
    every cluster op performs for its changed cluster(s)
  - `geo_prior_costs_per_object`: the per-proposal delta-cost vector
    (reference prior.py:824-852) used by the gibbsish geo weighting
  - per-op step times with geo on vs off (the end-to-end view)

    python benchmarks/geo_probe.py
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


def build(geo_on: bool):
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.experiment import Experiment
    from sbayes_tpu.model.model import Model

    custom = {"results": {"path": "/tmp/geo_probe_results"}}
    if geo_on:
        custom["model"] = {"prior": {"geo": {
            "type": "cost_based", "rate": 1_000_000.0, "aggregation": "mean",
            "probability_function": "exponential",
        }}}
    exp = Experiment(
        config_file="/root/reference/experiments/south_america/config.yaml",
        experiment_name="geo_probe", custom_settings=custom, log=False,
    )
    data = Data.from_experiment(exp)
    model = Model(data, exp.config.model)
    return model, exp


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(n_chains=1024):
    from sbayes_tpu.model.posterior import Posterior

    model, exp = build(geo_on=True)
    post = Posterior(model.consts)
    # build a batch of random cluster masks directly (what the geo code sees)
    K, N = model.consts.K, model.consts.N
    masks = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.2, (n_chains, K, N))

    # 1) carried-aggregate update: one cluster's skeleton triple per chain
    f_triple = jax.jit(jax.vmap(lambda m: post.skeleton_triple(m[0])))
    t = timeit(f_triple, masks)
    print(f"skeleton_triple (masked Prim, 1 cluster x {n_chains} chains): "
          f"{t*1e3:.2f} ms", flush=True)

    # 2) per-proposal delta-cost vector
    agg = jax.jit(jax.vmap(lambda m: jax.vmap(post.skeleton_triple)(m)))(masks)

    def delta(clusters, geo_agg):
        return post.geo_prior_costs_per_object(clusters, 0, geo_agg=geo_agg)

    f_delta = jax.jit(jax.vmap(delta))
    t = timeit(f_delta, masks, agg)
    print(f"geo_prior_costs_per_object (carried agg) x {n_chains}: "
          f"{t*1e3:.2f} ms", flush=True)

    f_delta_nc = jax.jit(jax.vmap(lambda m: post.geo_prior_costs_per_object(m, 0)))
    t = timeit(f_delta_nc, masks)
    print(f"geo_prior_costs_per_object (re-Prim)     x {n_chains}: "
          f"{t*1e3:.2f} ms", flush=True)

    # 3) geo prior from carried aggregates (MH accept path)
    f_prior = jax.jit(jax.vmap(lambda m, a: post.geo_prior_from_agg(m, a)))
    t = timeit(f_prior, masks, agg)
    print(f"geo_prior_from_agg x {n_chains}: {t*1e3:.2f} ms", flush=True)

    # 4) MST engine shoot-out on the vmapped ensemble: Prim's while_loop
    #    runs to the BATCH-MAX cluster size across all chains; Boruvka is
    #    fixed log-depth dense work. Sweep cluster densities to find the
    #    crossover (VERDICT r3 weak #2).
    for dens in (0.1, 0.3, 0.6):
        m_d = jax.random.bernoulli(jax.random.PRNGKey(2), dens, (n_chains, N))
        # one straggler chain with a near-full cluster (the vmap worst case)
        m_d = m_d.at[0].set(jnp.ones(N, bool))
        for eng in ("prim", "prim_mm"):
            os.environ["SBAYES_TPU_MST"] = eng
            f = jax.jit(jax.vmap(post.skeleton_triple))
            t = timeit(f, m_d)
            print(f"skeleton_triple[{eng}] density={dens} (+1 full straggler) "
                  f"x {n_chains}: {t*1e3:.2f} ms", flush=True)
    os.environ.pop("SBAYES_TPU_MST", None)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
