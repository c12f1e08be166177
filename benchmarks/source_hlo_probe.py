"""Dump the optimized-HLO op census of the in-scan gibbs_sample_source
body at the headline shape, to locate where its ~3.5 ms/step goes
(ablation deltas do not add up, so attribute from the compiled program).

    python benchmarks/source_hlo_probe.py [n_chains]

Prints: XLA cost analysis, then a census of non-trivial HLO ops inside
the scan body (kind, output shape, count), largest shapes first.
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax import lax

from sbayes_tpu.model.math import gather_rows, sample_categorical_onehot
from sbayes_tpu.model.posterior import Posterior
from sbayes_tpu.sampling.conditionals import Conditionals
from sbayes_tpu.sampling.runner import SamplerRuntime, _refresh_states_jit
from sbayes_tpu.sampling.operators import OperatorFactory
from sbayes_tpu.testing import synthetic_config, synthetic_data


def main(B=1024):
    data = synthetic_data(n_objects=100, n_features=36, n_states=6,
                          n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    from sbayes_tpu.model.model import Model
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)
    states = rt.init_chains(jax.random.PRNGKey(0), B)
    states = _refresh_states_jit(rt.consts, rt.sample_from_prior, states)
    cond = Conditionals(Posterior(rt.consts, False), 1.0, 1.0)
    consts = cond.consts
    N = consts.N
    m = 20
    feats = jnp.asarray(consts.features)
    na = jnp.asarray(consts.na)
    hc_conf = jnp.asarray(consts.hc_conf)
    fac = OperatorFactory(cond, p_grow=0.5)

    def op(key, state):
        k_sel, k_draw = jax.random.split(key)
        counts_old = (state.cl_counts, state.conf_counts)
        obj_idx = jax.random.choice(k_sel, N, shape=(m,), replace=False)
        valid = jnp.ones(m, bool)
        feats_m = feats[obj_idx].astype(jnp.float32)
        na_m = na[obj_idx]
        old_rows = gather_rows(state.source, obj_idx)
        hc_conf_m = hc_conf[obj_idx]
        hc0 = jnp.any(state.clusters[:, obj_idx], axis=0)
        hc_m = jnp.concatenate([hc0[:, None], hc_conf_m], axis=1)
        p = cond.source_posterior_rows(state.clusters, state.weights,
                                       counts_old, obj_idx, feats_m, na_m)
        x = sample_categorical_onehot(k_draw, p) & ~na_m[:, :, None]
        new_rows = jnp.where(valid[:, None, None], x, old_rows)
        log_q = cond._rows_logp(p, new_rows, valid, na_m)
        counts_new = cond.delta_counts_rows(
            counts_old, state.clusters, obj_idx, valid,
            old_rows, new_rows, feats_m)
        pat_new = fac._delta_pat(state.pat_counts, obj_idx, valid,
                                 hc0, hc0, old_rows, new_rows)
        p_back = cond.source_posterior_rows(
            state.clusters, state.weights, counts_new, obj_idx,
            feats_m, na_m)
        log_q_back = cond._rows_logp(p_back, old_rows, valid, na_m)
        sp_delta = (
            cond.source_prior_rows_logp(state.weights, hc_m, new_rows, valid, na_m)
            - cond.source_prior_rows_logp(state.weights, hc_m, old_rows, valid, na_m))
        return (log_q, log_q_back, sp_delta,
                counts_new[0].sum() * 1e-6, counts_new[1].sum() * 1e-6,
                pat_new.sum() * 1e-6)

    STEPS = 50

    def run(keys2, states2):
        def body(carry, k):
            ks = jax.random.split(k, B)
            out = jax.vmap(op)(ks, states2)
            return carry + sum(jnp.sum(o) for o in jax.tree.leaves(out)), None
        tot, _ = lax.scan(body, jnp.zeros(()), keys2)
        return tot

    keys_scan = jax.random.split(jax.random.PRNGKey(11), STEPS)
    compiled = jax.jit(run).lower(keys_scan, states).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    for k in sorted(ca):
        if ca[k] and not k.startswith("utilization"):
            print(f"cost[{k}] = {ca[k]:.3e}")

    txt = compiled.as_text()
    print(f"\nHLO text: {len(txt.splitlines())} lines")

    # census of ops inside the while-loop body (the scan)
    in_body = False
    census = Counter()
    bigshapes = Counter()
    for line in txt.splitlines():
        if re.match(r"\s*%?(wide\.)?region", line) or "while" in line and "body" in line and "{" in line:
            in_body = True
        m2 = re.match(r"\s*(ROOT\s+)?%?\S+ = (\S+?)\[([\d,]*)\][^ ]* (\w+)", line)
        if not m2:
            continue
        dtype, shape, kind = m2.group(2), m2.group(3), m2.group(4)
        if kind in ("parameter", "constant", "tuple", "get-tuple-element",
                    "bitcast", "reshape"):
            continue
        dims = [int(d) for d in shape.split(",") if d] or [1]
        size = 1
        for d in dims:
            size *= d
        census[kind] += 1
        if size >= (1 << 20):
            bigshapes[f"{kind} {dtype}[{shape}]"] += 1

    print("\nop census (whole program):")
    for k, v in census.most_common(30):
        print(f"  {k:30s} {v}")
    print("\nops with >=1M elements:")
    for k, v in bigshapes.most_common(40):
        print(f"  {v:4d}x {k}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
