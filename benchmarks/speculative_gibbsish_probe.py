"""Measure-or-kill probe for the speculative two-proposal gibbsish variant
(VERDICT r4 #3).

The proposed optimization evaluates backward marginals for the top-k
forward-proposal candidates in one fused pass (sharing the int8 feature
stream) and only runs a dedicated backward sweep when the drawn object is
NOT among them. Its payoff is bounded by the top-k MASS of the forward
proposal distribution at equilibrium:

    cost(spec)  = fwd + fused_k_bwd + (1 - hit_k) * bwd
    cost(plain) = fwd + bwd

With the marginal kernel VPU-bound (expansion shared, per-row reductions
scale with k: fused_k_bwd ~ (1 + k)/2 * bwd, benchmarks/ROOFLINE.md
round 4), speculation wins only when hit_k is large — k=3 needs roughly
hit_3 > 0.6 to break even. This probe measures hit_k = the probability
mass of the top-k candidates under the heated forward proposal p_fwd
(operators.py make_alter_cluster lines ~610-621) on the equilibrated
10k x 5k workload.

    python benchmarks/speculative_gibbsish_probe.py [n_objects n_features]
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


def run(n_objects=10_000, n_features=5_000, n_chains=2, equil_steps=200):
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.kernel import OperatorStats
    from sbayes_tpu.sampling.operators import OperatorFactory, _heat_prob
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.testing import synthetic_config
    from sbayes_tpu.testing_scale import synthetic_data_large

    data = synthetic_data_large(n_objects=n_objects, n_features=n_features,
                                n_states=5, n_families=10, seed=0,
                                cache_dir="/root/repo/.scale_cache")
    config = synthetic_config(n_clusters=5, geo_prior="uniform")
    config.model.prior.objects_per_cluster.min = 10
    config.model.prior.objects_per_cluster.max = 3000
    model = Model(data, config.model)
    cfg = config.mcmc.model_copy(update={
        "initialization": config.mcmc.initialization.model_copy(update={
            "attempts": 1, "em_steps": 3, "objects_per_cluster": 200,
        })
    })
    rt = SamplerRuntime(model, cfg, sample_from_prior=False)

    t0 = time.perf_counter()
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    carry = rt.run_chunk(keys, states, stats, ones, ones, equil_steps)
    jax.block_until_ready(carry.state)
    print(f"equilibration ({equil_steps} steps): {time.perf_counter() - t0:.0f}s",
          flush=True)
    states = carry.state

    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals

    consts = rt.consts
    K = consts.K
    TOPK = (1, 2, 3, 8, 32)

    @jax.jit
    def probe_one(consts_, key, state):
        cond = Conditionals(Posterior(consts_, False), 1.0, 1.0)
        factory = OperatorFactory(cond, p_grow=0.5)
        k_c, k_g = jax.random.split(key)
        i_cluster = jax.random.randint(k_c, (), 0, K)
        cluster = state.clusters[i_cluster]
        size = cluster.sum()
        do_grow = jnp.where(size <= consts_.min_size, True,
                            jnp.where(size >= consts_.max_size, False,
                                      jax.random.uniform(k_g) < 0.5))
        counts = (state.cl_counts, state.conf_counts)
        grow_cand = factory._grow_candidates(state.clusters, i_cluster,
                                             "everywhere")
        p_post = _heat_prob(
            factory._cluster_posterior(state, i_cluster, grow_cand,
                                       consider_geo=False, gibbsish=True,
                                       counts=counts), 1.0)
        p_vec = jnp.where(do_grow, jnp.where(grow_cand, p_post, 0.0),
                          jnp.where(cluster, 1.0 - p_post, 0.0))
        p_fwd = p_vec / jnp.maximum(p_vec.sum(), 1e-35)
        top = jax.lax.top_k(p_fwd, max(TOPK))[0]
        return jnp.cumsum(top), do_grow

    n_draws = 50
    masses = {k: [] for k in TOPK}
    grow_ct = 0
    for i in range(n_draws):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        for c in range(n_chains):
            state_c = jax.tree.map(lambda x: x[c], states)
            cum, do_grow = probe_one(consts, jax.random.fold_in(key, c), state_c)
            cum = np.asarray(cum)
            grow_ct += bool(do_grow)
            for k in TOPK:
                masses[k].append(float(cum[k - 1]))

    print(f"{n_draws * n_chains} proposal distributions "
          f"({grow_ct} grow / {n_draws * n_chains - grow_ct} shrink) at "
          f"N={n_objects} F={n_features}:")
    for k in TOPK:
        m = np.asarray(masses[k])
        print(f"  top-{k:2d} mass: mean {m.mean():.3f}  median "
              f"{np.median(m):.3f}  p90 {np.percentile(m, 90):.3f}")
    m3 = np.asarray(masses[3]).mean()
    verdict = "VIABLE (build it)" if m3 > 0.6 else "NOT VIABLE (kill)"
    print(f"speculative k=3 break-even needs hit_3 > ~0.6; measured "
          f"{m3:.3f} -> {verdict}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
