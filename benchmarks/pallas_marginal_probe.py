"""Real-TPU probe for the Pallas fused marginal kernel (VERDICT r2 #1).

    python benchmarks/pallas_marginal_probe.py small   # compile + parity + micro-bench
    python benchmarks/pallas_marginal_probe.py scale   # 10k x 5k gibbsish branch on/off

small: moderate shape, compiles the kernel on the real TPU, checks parity
against the XLA closed-form path, and times both marginal evaluations.

scale: builds the 10k x 5k model twice (kernel on / off) and reports the
per-operator branch times (roofline-style), i.e. the end-to-end win.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build(n_objects, n_features, pallas: bool, fc: int, large=False):
    os.environ["SBAYES_TPU_FEATURE_CHUNK"] = str(fc)
    os.environ["SBAYES_TPU_PALLAS_MARGINAL"] = "1" if pallas else "0"
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.testing import synthetic_config

    if large:
        from sbayes_tpu.testing_scale import synthetic_data_large
        data = synthetic_data_large(n_objects=n_objects, n_features=n_features,
                                    n_states=5, n_families=10, seed=0,
                                    cache_dir="/root/repo/.scale_cache")
    else:
        from sbayes_tpu.testing import synthetic_data
        data = synthetic_data(n_objects=n_objects, n_features=n_features,
                              n_states=5, n_families=10, seed=0)
    config = synthetic_config(n_clusters=5, geo_prior="uniform")
    config.model.prior.objects_per_cluster.min = 2
    config.model.prior.objects_per_cluster.max = max(50, n_objects // 3)
    return Model(data, config.model), config


def probe_small(n_objects=1024, n_features=512, fc=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import OperatorFactory
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample

    model, config = build(n_objects, n_features, pallas=True, fc=fc)
    c = model.consts
    assert (c.features_tl is not None or c.features_idx_tl is not None), \
        "pallas layout not built"
    cond = Conditionals(Posterior(c), 1.0, 1.0)
    state = generate_prior_sample(jax.random.PRNGKey(0), cond)
    state = cond.post.fill_state(state)
    counts = (state.cl_counts, state.conf_counts)

    def make_run(fact):
        def run(state):
            return fact._cluster_log_odds(
                state, 1, jnp.ones(c.N, bool), counts=counts)
        return run

    os.environ["SBAYES_TPU_PALLAS_BF16MM"] = "0"
    fact32 = OperatorFactory(cond)
    factx = OperatorFactory(cond)
    factx._pm_cache = None  # disable -> XLA tiled path

    # STRICT parity: force exact f32 matmuls on BOTH paths. At DEFAULT
    # precision the MXU runs f32 matmuls as a single bf16 pass, and the
    # fused kernel's pre-scaled confounder mixture rounds differently
    # from the XLA path's post-scaled one (~5e-3 apart, both "wrong" at
    # bf16) — under HIGHEST both are exact f32 and must agree tightly.
    with jax.default_matmul_precision("highest"):
        t0 = time.perf_counter()
        m = jax.jit(make_run(fact32))(state)
        jax.block_until_ready(m)
        print(f"pallas(f32,highest) compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        x = jax.jit(make_run(factx))(state)
        jax.block_until_ready(x)
    gap = float(jnp.max(jnp.abs(m - x) / (jnp.abs(x) + 1)))
    print(f"parity max rel gap (log-odds, f32 highest-prec): {gap:.2e}",
          flush=True)
    assert gap < 2e-4, "PARITY FAIL"

    # fast paths (DEFAULT precision + explicit bf16 operand casts): both
    # round the confounder background at bf16; proposal-shaping only
    os.environ["SBAYES_TPU_PALLAS_BF16MM"] = "1"
    fact16 = OperatorFactory(cond)
    t0 = time.perf_counter()
    m16 = jax.jit(make_run(fact16))(state)
    jax.block_until_ready(m16)
    print(f"pallas(bf16mm) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    gap16 = float(jnp.max(jnp.abs(m16 - x) / (jnp.abs(x) + 1)))
    print(f"parity max rel gap (log-odds, bf16mm vs exact): {gap16:.2e}",
          flush=True)
    assert gap16 < 0.1, "BF16 PARITY FAIL"

    # timings
    def timeit(fn):
        j = jax.jit(fn)
        jax.block_until_ready(j(state))
        t0 = time.perf_counter()
        for _ in range(20):
            out = j(state)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 20

    t_f32 = timeit(make_run(fact32))
    t_b16 = timeit(make_run(fact16))
    t_xla = timeit(make_run(factx))
    print(f"marginal eval: pallas(bf16mm) {t_b16*1e3:.2f} ms  "
          f"pallas(f32) {t_f32*1e3:.2f} ms  xla {t_xla*1e3:.2f} ms  "
          f"speedup vs xla {t_xla/t_b16:.2f}x", flush=True)


def probe_scale(n_objects=10_000, n_features=5_000, n_chains=2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sbayes_tpu.sampling.runner import SamplerRuntime

    results = {}
    for pallas in (True, False):
        model, config = build(n_objects, n_features, pallas=pallas, fc=500, large=True)
        cfg = config.mcmc.model_copy(update={
            "initialization": config.mcmc.initialization.model_copy(update={
                "attempts": 1, "em_steps": 2, "objects_per_cluster": 100,
            })
        })
        rt = SamplerRuntime(model, cfg, sample_from_prior=False)
        states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
        jax.block_until_ready(states.clusters)
        keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
        ones = jnp.ones(n_chains, jnp.float32)
        t0 = time.perf_counter()
        times = rt.measure_op_step_times(keys, states, ones, ones, n_steps=10)
        print(f"pallas={pallas}: probe wall {time.perf_counter()-t0:.0f}s", flush=True)
        for spec, t in zip(rt._op_specs_cold, times):
            print(f"  {spec.name:40s} {t*1e3:8.2f} ms", flush=True)
        w = np.asarray([s.weight for s in rt._op_specs_cold])
        mean = float((w / w.sum() * times).sum())
        print(f"  schedule-weighted mean: {mean*1e3:.2f} ms "
              f"({1/mean:.1f} ensemble-steps/s)", flush=True)
        results[pallas] = mean
    print(f"\nend-to-end speedup from pallas marginal: "
          f"{results[False]/results[True]:.2f}x", flush=True)


def probe_stages(n_objects=10_000, n_features=5_000, n_chains=2):
    """Where does the gibbsish branch's time go at scale? Times the fused
    marginal evaluation ALONE (ratio and both variants, vmapped over the
    chain axis like the production kernel) against the full branch time,
    isolating the non-marginal residual (proposal draw scatter chain,
    rows resample, count deltas, MH plumbing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import OperatorFactory
    from sbayes_tpu.sampling.runner import SamplerRuntime

    model, config = build(n_objects, n_features, pallas=True, fc=500, large=True)
    c = model.consts
    cfg = config.mcmc.model_copy(update={
        "initialization": config.mcmc.initialization.model_copy(update={
            "attempts": 1, "em_steps": 2, "objects_per_cluster": 100,
        })
    })
    rt = SamplerRuntime(model, cfg, sample_from_prior=False)
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains)
    jax.block_until_ready(states.clusters)

    avail = jnp.ones(c.N, bool)

    # consts is an EXPLICIT jit argument (like SamplerRuntime's plumbing):
    # closure-captured feature tiles would be baked into the HLO as
    # literals, which the remote-compile tunnel rejects at 10k x 5k
    # (HTTP 413) — cf. model/constants.py "Place the big arrays" note.
    def marg_ratio(consts, state):
        fact = OperatorFactory(Conditionals(Posterior(consts), 1.0, 1.0))
        return fact._cluster_log_odds(
            state, 1, avail, counts=(state.cl_counts, state.conf_counts))

    def marg_post(consts, state):
        # marginal + geo + sigmoid — everything a grow/shrink proposal needs
        fact = OperatorFactory(Conditionals(Posterior(consts), 1.0, 1.0))
        return fact._cluster_posterior(
            state, 1, avail, consider_geo=False,
            counts=(state.cl_counts, state.conf_counts))

    def timeit(label, fn):
        j = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
        jax.block_until_ready(j(c, states))
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = j(c, states)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {label:44s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    print(f"stages @ {n_objects}x{n_features}, {n_chains} chains:", flush=True)
    t_marg = timeit("fused marginal (ratio, noheat), 1 call", marg_ratio)
    timeit("cluster posterior (marginal+sigmoid), 1 call", marg_post)

    keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    ones = jnp.ones(n_chains, jnp.float32)
    times = rt.measure_op_step_times(keys, states, ones, ones, n_steps=10)
    by = {s.name: t for s, t in zip(rt._op_specs_cold, times)}
    for name, t in by.items():
        print(f"  branch {name:37s} {t*1e3:8.2f} ms", flush=True)
    gib = next((t for n, t in by.items() if "gibbsish" in n and "wide" not in n
                and "jump" not in n), None)
    if gib:
        print(f"  gibbsish residual beyond 2 marginal calls: "
              f"{(gib - 2 * t_marg)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "small":
        probe_small(*[int(a) for a in sys.argv[2:]])
    elif mode == "stages":
        probe_stages(*[int(a) for a in sys.argv[2:]])
    else:
        probe_scale(*[int(a) for a in sys.argv[2:]])
