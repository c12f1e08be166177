"""Reproduce the round-3 bench NaN on the real south_america workload.

Runs short chunks on a small chain ensemble and reports where the first
non-finite value appears (log_lh / prior parts / counts / geo_agg), plus
the per-op accept counts up to that point.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/nan_repro.py [geo]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/tests/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def main(geo_on=False, n_chains=1024, chunk=200, n_chunks=60):
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.sampling.kernel import OperatorStats

    sa = Path("/root/reference/experiments/south_america/config.yaml")
    custom = {"results": {"path": "/tmp/nan_repro_results", "log_file": False}}
    if geo_on:
        custom["model"] = {"prior": {"geo": {"type": "cost_based", "rate": 500_000,
                                             "aggregation": "mean"}}}
    config = SBayesConfig.from_config_file(sa, custom)
    data = Data.from_config(config)
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc)

    states = rt.init_chains(jax.random.PRNGKey(0), n_chains, shard=False)
    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)

    def report(tag, states, stats):
        lh = np.asarray(states.log_lh)
        pp = np.asarray(states.prior_parts)
        nf = int(np.asarray(stats.non_finite).sum())
        bad = ~np.isfinite(lh) | ~np.isfinite(pp).all(-1)
        print(f"{tag}: non_finite_ctr={nf} bad_chains={bad.sum()}", flush=True)
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            print(f"  chain {i}: log_lh={lh[i]} prior_parts={pp[i]}", flush=True)
            cl = np.asarray(states.cl_counts[i])
            cf = np.asarray(states.conf_counts[i])
            print(f"  counts finite: cl={np.isfinite(cl).all()} conf={np.isfinite(cf).all()}")
            if states.geo_agg is not None:
                print(f"  geo_agg: {np.asarray(states.geo_agg[i])}")
            acc = np.asarray(stats.accepts[i] if stats.accepts.ndim > 1 else stats.accepts)
            print("  accepts:", dict(zip(rt.op_names, acc.tolist())), flush=True)
            # recompute oracle
            from sbayes_tpu.model.posterior import Posterior
            post = Posterior(rt.consts)
            st = jax.tree.map(lambda x: x[i], states)
            parts = jax.jit(post.parts)(st)
            print(f"  oracle: lh={float(parts.log_lh):.3f} size={float(parts.size_prior):.3f} "
                  f"geo={float(parts.geo_prior):.3f} w={float(parts.weights_prior):.3f} "
                  f"src={float(parts.source_prior):.3f}", flush=True)
            src = np.asarray(states.source[i])
            na = np.asarray(rt.consts.na)
            print(f"  source rowsum ok: {(src.sum(-1) == (~na)).all()}")
            return True
        return False

    report("init", states, stats)
    for c in range(n_chunks):
        carry = rt.run_chunk(keys, states, stats, ones, ones, chunk)
        keys, states, stats = carry.key, carry.state, carry.stats
        if report(f"chunk {c}", states, stats):
            break
    else:
        print("no non-finite values observed", flush=True)


if __name__ == "__main__":
    main(geo_on="geo" in sys.argv[1:])
