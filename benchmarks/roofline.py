"""HBM roofline probe: how close is the sampler to speed-of-light?

The collapsed-likelihood sampler is memory-bound: the irreducible work of
one full posterior evaluation is streaming the one-hot feature tensor
(N·F·S) and the source tensor (N·F·C) once through the count einsums.
This probe measures

  1. ``min_pass``  — wall time of ONE fused count+loglh recompute
     (= the speed-of-light unit for a full-recompute step),
  2. per-operator-branch ensemble step times (runner.measure_op_step_times),
  3. the achieved HBM bandwidth of the minimal pass and each branch's cost
     expressed in multiples of ``min_pass``.

With the carried-counts + gathered-rows engines (round 2), cluster/jump/
source branches should cost FRACTIONS of a minimal pass (they no longer
re-stream the feature tensor); the wide branch pays ~2 passes and the
membership marginals dominate the remainder.

    python benchmarks/roofline.py [n_objects n_features n_chains]
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

HBM_PEAK_GBS = 819.0  # v5e spec


def main(n_objects=10_000, n_features=5_000, n_chains=2):
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.testing import synthetic_config

    if n_objects * n_features > 1_000_000:
        from sbayes_tpu.testing_scale import synthetic_data_large as make_data
        data = make_data(n_objects=n_objects, n_features=n_features,
                         n_states=5, n_families=10, seed=0,
                         cache_dir="/root/repo/.scale_cache")
        n_states = 5
    else:
        from sbayes_tpu.testing import synthetic_data
        data = synthetic_data(n_objects=n_objects, n_features=n_features,
                              n_states=5, n_families=10, seed=0)
        n_states = 5
    config = synthetic_config(n_clusters=5, geo_prior="uniform")
    config.model.prior.objects_per_cluster.min = 2
    config.model.prior.objects_per_cluster.max = max(50, n_objects // 3)
    model = Model(data, config.model)
    c = model.consts
    feat_bytes = np.dtype(np.asarray(jnp.zeros((), c.features.dtype)).dtype).itemsize
    print(f"shape N={c.N} F={c.F} S={c.S} C={c.C} feature dtype={c.features.dtype} "
          f"feature_chunk={c.feature_chunk}", flush=True)

    cfg = config.mcmc.model_copy(update={
        "initialization": config.mcmc.initialization.model_copy(update={
            "attempts": 1, "em_steps": 2, "objects_per_cluster": max(5, n_objects // 100),
        })
    })
    rt = SamplerRuntime(model, cfg, sample_from_prior=False)
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    jax.block_until_ready(states.clusters)

    # --- 1. minimal pass: one fused counts+loglh recompute per chain ---
    from sbayes_tpu.model.posterior import Posterior

    def min_pass(consts, clusters_b, source_b):
        def one(clusters, source):
            p = Posterior(consts)
            cl, conf = p.feature_counts(clusters, source)
            return p.log_likelihood_from_counts(cl, conf)
        return jax.vmap(one)(clusters_b, source_b)

    jitted = jax.jit(min_pass)
    out = jitted(c, states.clusters, states.source)
    jax.block_until_ready(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jitted(c, states.clusters, states.source)
        jax.block_until_ready(out)
    t_pass = (time.perf_counter() - t0) / reps
    # bytes: features once per chain + source once per chain (bool)
    bytes_streamed = n_chains * (c.N * c.F * c.S * feat_bytes + c.N * c.F * c.C * 1)
    gbs = bytes_streamed / t_pass / 1e9
    print(f"min_pass ({n_chains} chains): {t_pass*1e3:.2f} ms  "
          f"~{gbs:.0f} GB/s = {100*gbs/HBM_PEAK_GBS:.0f}% of HBM peak", flush=True)

    # --- 2. per-branch step times ---
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    ones = jnp.ones(n_chains, jnp.float32)
    times = rt.measure_op_step_times(keys, states, ones, ones, n_steps=10)
    print("\nper-operator ensemble-step cost (multiples of min_pass):", flush=True)
    for spec, t in zip(rt._op_specs_cold, times):
        print(f"  {spec.name:40s} {t*1e3:8.2f} ms   {t/t_pass:6.2f}x", flush=True)
    sched_w = np.asarray([s.weight for s in rt._op_specs_cold])
    sched_w = sched_w / sched_w.sum()
    mean_step = float((sched_w * times).sum())
    print(f"\nschedule-weighted mean step: {mean_step*1e3:.2f} ms "
          f"({mean_step/t_pass:.2f}x min_pass; {1/mean_step:.1f} ensemble-steps/s)",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
