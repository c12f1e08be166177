"""Pallas fused likelihood vs the XLA einsum path (VERDICT r1 weak #3).

Measures the batched full log-likelihood (counts + collapsed Dirichlet-
categorical reduction) at reference scale (south_america-shaped synthetic
data, VMEM-resident) for a chain batch, on the real TPU:

  * XLA path:    vmap(feature_counts -> log_likelihood_from_counts)
  * Pallas path: ops/pallas_kernels.make_pallas_log_likelihood

Prints per-path wall time and the relative numeric gap. Decides whether
``Posterior(use_pallas=True)`` should be the default for VMEM-fitting
shapes.

    python benchmarks/pallas_vs_xla.py [n_chains]
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


def main(n_chains=1024):
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.ops.pallas_kernels import fits_in_vmem, make_pallas_log_likelihood
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=100, n_features=36, n_states=6,
                          n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    c = model.consts
    assert fits_in_vmem(c.K, c.N, c.F, c.S, c.C, c.Gmax)
    post = Posterior(c)

    rng = np.random.default_rng(0)
    clusters_b = jnp.asarray(rng.random((n_chains, c.K, c.N)) < 0.2)
    # exclusive one-hot-ish source
    src_idx = rng.integers(0, c.C, size=(n_chains, c.N, c.F))
    source_b = jnp.asarray(src_idx[..., None] == np.arange(c.C))

    def xla_batch(consts, clusters_b, source_b):
        def one(clusters, source):
            p = Posterior(consts)
            cl, conf = p.feature_counts(clusters, source)
            return p.log_likelihood_from_counts(cl, conf)
        return jax.vmap(one)(clusters_b, source_b)

    xla = jax.jit(xla_batch)
    pallas = jax.jit(make_pallas_log_likelihood(c))

    def bench(fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, out

    t_x, out_x = bench(xla, c, clusters_b, source_b)
    t_p, out_p = bench(pallas, clusters_b, source_b)
    rel = float(jnp.max(jnp.abs(out_p - out_x) / jnp.maximum(jnp.abs(out_x), 1.0)))
    print(f"B={n_chains} N={c.N} F={c.F} S={c.S} C={c.C}")
    print(f"XLA    batched loglh: {t_x*1e3:8.3f} ms  ({n_chains/t_x:,.0f} evals/s)")
    print(f"Pallas batched loglh: {t_p*1e3:8.3f} ms  ({n_chains/t_p:,.0f} evals/s)")
    print(f"speedup: {t_x/t_p:.2f}x   max rel gap: {rel:.2e}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
