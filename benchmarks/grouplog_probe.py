"""Same-session grouplog on/off shoot-out for the fused marginal kernel
at the 10k x 5k scale shape (real TPU; tunnel noise cancels because both
variants run in one process, interleaved).

    python benchmarks/grouplog_probe.py [n_objects n_features n_chains]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def run(n_objects=10_000, n_features=5_000, n_chains=2, reps=30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sbayes_tpu.model.math import normalize
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.ops.pallas_marginal import (
        make_pallas_marginal, tile_layout_eff, wh_layout)
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config
    from sbayes_tpu.testing_scale import synthetic_data_large

    data = synthetic_data_large(n_objects=n_objects, n_features=n_features,
                                n_states=5, n_families=10, seed=0,
                                cache_dir="/root/repo/.scale_cache")
    config = synthetic_config(n_clusters=5, geo_prior="uniform")
    config.model.prior.objects_per_cluster.min = 2
    config.model.prior.objects_per_cluster.max = n_objects // 3
    model = Model(data, config.model)
    c = model.consts
    cond = Conditionals(Posterior(c), 1.0, 1.0)
    state = generate_prior_sample(jax.random.PRNGKey(0), cond)
    state = cond.post.fill_state(state)

    unif = jnp.asarray(c.unif_conc)
    p_eff = normalize(unif + state.cl_counts[1], axis=-1)
    conf_eff = normalize(state.conf_counts + jnp.asarray(c.conc_conf), axis=-1)
    p_eff_tl = tile_layout_eff(p_eff, c.F).reshape(1, -1)
    wh_tl = wh_layout(state.weights.T, c.F)
    hc = cond.post.has_components(state.clusters).astype(jnp.float32)
    hc_flip = hc.at[:, 0].set(1.0 - hc[:, 0])
    incl = hc[:, 0:1]
    conf_eff_tl = tile_layout_eff(conf_eff, c.F)

    args = (p_eff_tl, wh_tl, hc, hc_flip, incl, conf_eff_tl)
    # one vmapped chain axis like production
    b_args = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_chains,) + a.shape), args)

    outs = {}
    fns = {}
    for name, gl in (("grouplog", True), ("perlane", False)):
        pm = make_pallas_marginal(c, ratio=True, heat=False, grouplog=gl)
        f = jax.jit(jax.vmap(lambda *a: pm(*a)))
        out = f(*b_args)
        jax.block_until_ready(out)
        outs[name] = np.asarray(out[0])
        fns[name] = f
    gap = np.max(np.abs(outs["grouplog"] - outs["perlane"])
                 / (np.abs(outs["perlane"]) + 1))
    print(f"grouplog vs perlane max rel gap: {gap:.2e}", flush=True)

    # interleaved timing (A B A B ...) to cancel tunnel drift
    times = {"grouplog": [], "perlane": []}
    for _ in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            out = f(*b_args)
            jax.block_until_ready(out)
            times[name].append(time.perf_counter() - t0)
    import statistics
    for name in ("perlane", "grouplog"):
        ts = sorted(times[name])[2:-2]
        print(f"{name:9s}: median {statistics.median(ts)*1e3:.2f} ms "
              f"(mean {statistics.mean(ts)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    run(*[int(a) for a in sys.argv[1:]])
