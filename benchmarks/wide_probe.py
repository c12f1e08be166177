"""Wide-operator cost attribution at the headline shape.

The wide branch costs ~14 ms/ensemble-step (1024 chains, south_america)
vs ~2 ms for the single-object cluster branches — NEXT.md carry-forward.
This probe times single-branch chunks of ablated wide variants
(`_probe_skip` knobs in make_alter_cluster_wide — probe-only, they break
MH exactness) to attribute the fused in-scan cost, plus the production
wide branch and the fused geo_off chunk as anchors.

    python benchmarks/wide_probe.py [variant ...]

Requires the TPU tunnel.
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from branch_budget import _build_runtime, _fused_ms_per_step, N_CHAINS

VARIANTS = {
    "w_full": (),
    "w_no_back": ("back",),
    "w_no_src": ("src",),
    "w_no_back_src": ("back", "src"),
    "w_const_probs": ("probs",),
    "w_no_redraw": ("redraw",),
    "w_min": ("probs", "src", "redraw"),
}


def main(only=()):
    unknown = set(only) - set(VARIANTS)
    if unknown:
        sys.exit(f"unknown variant(s) {sorted(unknown)}; valid: {', '.join(VARIANTS)}")

    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.kernel import make_mh_apply_fn
    from sbayes_tpu.sampling.operators import OperatorFactory, OperatorSpec

    rt = _build_runtime(geo_on=False)
    states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
    keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)

    def branch_ms(probe_skip, n_steps=20):
        def run(consts, keys, states, n_steps):
            def apply_one(key, state):
                cond = Conditionals(Posterior(consts, False), 1.0, 1.0)
                factory = OperatorFactory(cond, p_grow=rt.p_grow)
                op = factory.make_alter_cluster_wide(
                    consider_geo=False, _probe_skip=probe_skip)
                spec = OperatorSpec("wide_probe", 1.0, op, "clusters")
                return make_mh_apply_fn(cond, [spec])(0, key, state)

            vapply = jax.vmap(apply_one)

            def body(carry, _):
                keys, states = carry
                split = jax.vmap(jax.random.split)(keys)
                keys, k_apply = split[:, 0], split[:, 1]
                new_states, _, _, _ = vapply(k_apply, states)
                return (keys, new_states), None

            (keys, states), _ = jax.lax.scan(body, (keys, states), length=n_steps)
            return states

        jitted = jax.jit(run, static_argnums=(3,))
        jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best * 1e3

    for name, skip in VARIANTS.items():
        if only and name not in only:
            continue
        print(f"{name:15s}: {branch_ms(skip):6.2f} ms/ensemble-step", flush=True)

    if not only:
        fused = _fused_ms_per_step(rt)
        print(f"{'fused_geo_off':15s}: {fused:6.3f} ms/ensemble-step "
              f"({N_CHAINS * 1e3 / fused:,.0f} chain-steps/s)")


def stages():
    """In-scan timings of the wide op's src-block stages in isolation
    (each stage's output is folded into the carried key so iterations
    serialize and nothing dead-code-eliminates)."""
    from sbayes_tpu.model.math import gather_rows
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals

    rt = _build_runtime(geo_on=False)
    c = rt.consts
    states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
    keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)
    M = c.N  # wide_rows_cap at N<=1024

    def scan_stage(stage_fn, n_steps=20):
        def run(consts, keys, states, n_steps):
            def one(key, state):
                cond = Conditionals(Posterior(consts, False), 1.0, 1.0)
                return stage_fn(cond, consts, key, state)

            vone = jax.vmap(one)

            def body(carry, _):
                keys = carry
                split = jax.vmap(jax.random.split)(keys)
                keys, k_apply = split[:, 0], split[:, 1]
                out = vone(k_apply, states)
                keys = jax.vmap(jax.random.fold_in)(keys, out.astype(jnp.uint32))
                return keys, None

            keys2, _ = jax.lax.scan(body, keys, length=n_steps)
            return keys2

        jitted = jax.jit(run, static_argnums=(3,))
        jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best * 1e3

    def mk_idx(consts, key, state):
        k1, _ = jax.random.split(key)
        changed = jax.random.uniform(k1, (consts.N,)) < 0.2
        m = changed.sum()
        obj_idx = jnp.nonzero(changed, size=M, fill_value=consts.N)[0]
        valid = jnp.arange(M) < m
        return obj_idx, valid, m

    def s_gather(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        feats_m = jnp.asarray(consts.features)[obj_idx].astype(jnp.float32)
        rows = gather_rows(state.source, obj_idx, consts.C)
        return feats_m.sum() + rows.sum() + m

    def _counts(cond, state):
        if state.cl_counts is None:
            return cond.post.feature_counts(state.clusters, state.source)
        return (state.cl_counts, state.conf_counts)

    def s_rs(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        counts = _counts(cond, state)
        rs = cond.gibbs_resample_source_rows(
            key, state, state.clusters, obj_idx, valid, 0, counts)
        return rs.log_q + rs.log_q_back + rs.source_prior_delta + m

    def s_dc(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        counts = _counts(cond, state)
        feats_m = jnp.asarray(consts.features)[obj_idx].astype(jnp.float32)
        rows = gather_rows(state.source, obj_idx, consts.C)
        cl, conf = cond.delta_counts_rows_move(
            counts, state.clusters, state.clusters, obj_idx, valid,
            rows, rows, feats_m)
        return cl.sum() + conf.sum() + m

    def mk_idx2(consts, key, state):
        """argsort-based compaction: same output contract as
        nonzero(size=M, fill_value=N) — ascending changed indices,
        padded with N."""
        k1, _ = jax.random.split(key)
        changed = jax.random.uniform(k1, (consts.N,)) < 0.2
        m = changed.sum()
        ar = jnp.arange(consts.N, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(changed, ar, consts.N + ar))
        obj_idx = jnp.where(jnp.arange(M) < m, order[:M], consts.N)
        valid = jnp.arange(M) < m
        return obj_idx, valid, m

    def s_idx(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        return obj_idx.sum() + valid.sum() + m

    def s_idx2(cond, consts, key, state):
        obj_idx, valid, m = mk_idx2(consts, key, state)
        return obj_idx.sum() + valid.sum() + m

    def s_feats2(cond, consts, key, state):
        obj_idx, valid, m = mk_idx2(consts, key, state)
        feats = jnp.asarray(consts.features)
        oh = jax.nn.one_hot(obj_idx, consts.N, dtype=jnp.bfloat16)
        flat = feats.reshape(consts.N, -1).astype(jnp.bfloat16)
        feats_m = jnp.dot(oh, flat, preferred_element_type=jnp.float32)
        return feats_m.sum() + m

    def s_feats(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        feats_m = jnp.asarray(consts.features)[obj_idx].astype(jnp.float32)
        return feats_m.sum() + m

    def s_srcrows(cond, consts, key, state):
        obj_idx, valid, m = mk_idx(consts, key, state)
        rows = gather_rows(state.source, obj_idx, consts.C)
        return rows.sum() + m

    for name, fn in [("s_idx", s_idx), ("s_idx2", s_idx2),
                     ("s_feats", s_feats), ("s_feats2", s_feats2),
                     ("s_srcrows", s_srcrows),
                     ("s_gather", s_gather), ("s_rs", s_rs), ("s_dc", s_dc)]:
        print(f"{name:10s}: {scan_stage(fn):6.2f} ms/ensemble-step", flush=True)


def srcop():
    """Production source-op decomposition via its _probe_skip knobs
    (single-branch chunks of the REAL op incl. the MH kernel — unlike
    source_ablation_probe's inline clone, which predates the MXU gather
    helpers)."""
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.kernel import make_mh_apply_fn
    from sbayes_tpu.sampling.operators import OperatorFactory, OperatorSpec

    rt = _build_runtime(geo_on=False)
    states = rt.init_chains(jax.random.PRNGKey(0), N_CHAINS)
    keys = jax.random.split(jax.random.PRNGKey(1), N_CHAINS)

    def branch_ms(selector, max_size, probe_skip, n_steps=20):
        def run(consts, keys, states, n_steps):
            def apply_one(key, state):
                cond = Conditionals(Posterior(consts, False), 1.0, 1.0)
                factory = OperatorFactory(cond, p_grow=rt.p_grow)
                op = factory.make_gibbs_sample_source(
                    selector, max_size, _probe_skip=probe_skip)
                spec = OperatorSpec("src_probe", 1.0, op, "source")
                return make_mh_apply_fn(cond, [spec])(0, key, state)

            vapply = jax.vmap(apply_one)

            def body(carry, _):
                keys, states = carry
                split = jax.vmap(jax.random.split)(keys)
                keys, k_apply = split[:, 0], split[:, 1]
                new_states, _, _, _ = vapply(k_apply, states)
                return (keys, new_states), None

            (keys, states), _ = jax.lax.scan(body, (keys, states), length=n_steps)
            return states

        jitted = jax.jit(run, static_argnums=(3,))
        jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(rt.consts, keys, states, n_steps))
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best * 1e3

    for sel, cap in (("random_subset", 20), ("groups", 30)):
        for name, skip in [
            ("full", ()),
            ("no_sel", ("sel",)),
            ("no_back", ("back",)),
            ("no_delta", ("delta",)),
            ("no_pat", ("pat",)),
            ("min", ("sel", "back", "delta")),
        ]:
            ms = branch_ms(sel, cap, skip)
            print(f"{sel:14s} {name:9s}: {ms:6.2f} ms/ensemble-step", flush=True)


if __name__ == "__main__":
    if "stages" in sys.argv[1:]:
        stages()
    elif "srcop" in sys.argv[1:]:
        srcop()
    else:
        main(tuple(sys.argv[1:]))
