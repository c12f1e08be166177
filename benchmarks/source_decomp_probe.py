"""Decompose the gibbs_sample_source cost at the headline shape.

The family probe shows source at 6.81 ms/ensemble-step (1024 chains,
post MXU-gather) vs clusters at 2.10 ms despite O(m*F) work — this probe
times each sub-stage of op_rows under the same vmap to find the
serialized piece.

    python benchmarks/source_decomp_probe.py [n_chains]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from sbayes_tpu.model.math import gather_rows
from sbayes_tpu.model.model import Model
from sbayes_tpu.sampling.runner import SamplerRuntime, _refresh_states_jit
from sbayes_tpu.testing import synthetic_config, synthetic_data


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main(B=1024):
    data = synthetic_data(n_objects=100, n_features=36, n_states=6,
                          n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)
    states = rt.init_chains(jax.random.PRNGKey(0), B)
    states = _refresh_states_jit(rt.consts, rt.sample_from_prior, states)
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.model.posterior import Posterior
    cond = Conditionals(Posterior(rt.consts, False), 1.0, 1.0)
    consts = cond.consts
    N, K = consts.N, consts.K
    m = 20
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    feats = jnp.asarray(consts.features)
    na = jnp.asarray(consts.na)
    hc_conf = jnp.asarray(consts.hc_conf)

    # stage fns, each vmapped over chains exactly as in the op
    def sel(key, state):
        return jax.random.choice(key, N, shape=(m,), replace=False)

    def gath_consts(state, idx):
        return feats[idx], na[idx], hc_conf[idx]

    def gath_src(state, idx):
        return gather_rows(state.source, idx)

    def post_rows(state, idx):
        feats_m = feats[idx].astype(jnp.float32)
        counts = (state.cl_counts, state.conf_counts)
        return cond.source_posterior_rows(state.clusters, state.weights,
                                          counts, idx, feats_m, na[idx])

    def deltas(state, idx, new_rows):
        feats_m = feats[idx].astype(jnp.float32)
        old_rows = gather_rows(state.source, idx)
        valid = jnp.ones(m, bool)
        return cond.delta_counts_rows((state.cl_counts, state.conf_counts),
                                      state.clusters, idx, valid,
                                      old_rows, new_rows, feats_m)

    def sp_rows(state, idx, new_rows):
        valid = jnp.ones(m, bool)
        na_m = na[idx]
        hc0 = jnp.any(state.clusters[:, idx], axis=0)
        hc_m = jnp.concatenate([hc0[:, None], hc_conf[idx]], axis=1)
        return cond.source_prior_rows_logp(state.weights, hc_m, new_rows,
                                           valid, na_m)

    idxs = jax.jit(jax.vmap(sel))(keys, states)
    new_rows = jax.jit(jax.vmap(gath_src))(states, idxs)

    print(f"B={B} N={N} F={consts.F} S={consts.S} C={consts.C} m={m}")
    print(f"select (choice no-replace): {timeit(jax.jit(jax.vmap(sel)), keys, states):7.3f} ms")
    print(f"gather consts (feats/na/hc): {timeit(jax.jit(jax.vmap(gath_consts)), states, idxs):7.3f} ms")
    print(f"gather source rows (MXU):   {timeit(jax.jit(jax.vmap(gath_src)), states, idxs):7.3f} ms")
    print(f"source_posterior_rows:      {timeit(jax.jit(jax.vmap(post_rows)), states, idxs):7.3f} ms")
    print(f"delta_counts_rows:          {timeit(jax.jit(jax.vmap(deltas)), states, idxs, new_rows):7.3f} ms")
    print(f"source_prior_rows_logp:     {timeit(jax.jit(jax.vmap(sp_rows)), states, idxs, new_rows):7.3f} ms")

    # the MH kernel's per-feature diff-then-sum d_ll (runs twice per
    # source step: new counts and old counts)
    def ll_pf_diff(state, idx, new_rows):
        feats_m = feats[idx].astype(jnp.float32)
        old_rows = gather_rows(state.source, idx)
        valid = jnp.ones(m, bool)
        ncl, nconf = cond.delta_counts_rows(
            (state.cl_counts, state.conf_counts), state.clusters, idx, valid,
            old_rows, new_rows, feats_m)
        a = cond.post.log_likelihood_per_feature(ncl, nconf)
        b = cond.post.log_likelihood_per_feature(state.cl_counts, state.conf_counts)
        return (a[0] - b[0]).sum() + (a[1] - b[1]).sum()

    print(f"kernel d_ll (2x lgamma pf): {timeit(jax.jit(jax.vmap(ll_pf_diff)), states, idxs, new_rows):7.3f} ms")

    # full ops for reference
    from sbayes_tpu.sampling.operators import OperatorFactory
    fac = OperatorFactory(cond, p_grow=0.5)
    op_sub = fac.make_gibbs_sample_source("random_subset", max_size=20)
    op_grp = fac.make_gibbs_sample_source("groups", max_size=30)

    def run_op(op):
        def f(key, state):
            res = op(key, state)
            return res.log_q_back, res.step_size
        return jax.jit(jax.vmap(f))

    print(f"full op random_subset:      {timeit(run_op(op_sub), keys, states):7.3f} ms")
    print(f"full op groups:             {timeit(run_op(op_grp), keys, states):7.3f} ms")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
