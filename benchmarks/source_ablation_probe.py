"""Ablation probe for gibbs_sample_source.op_rows at the headline shape.

source_decomp_probe showed every sub-stage at the ~1.4 ms dispatch floor,
so standalone stage timings cannot attribute the 4.9 ms full-op cost.
This probe times the FULL vmapped op with pieces knocked out (each
variant is one compiled program, so the deltas attribute fused cost):

    v_full        the real op_rows (baseline)
    v_fixed_sel   subset indices fixed (no choice/top_k)
    v_no_back     backward posterior skipped (p_back := p)
    v_no_delta    delta_counts_rows skipped (counts_new := counts_old)
    v_no_sp       source-prior delta skipped
    v_no_pat      pattern-count delta skipped
    v_min         select + const gathers + forward sample + logp only

    python benchmarks/source_ablation_probe.py [n_chains] [variant ...]

With variant names given, only those run (and the non-scan block is
skipped) — keeps one tunnel session within the compile budget.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
from jax import lax

from sbayes_tpu.model.math import gather_rows, normalize, normalize_weights, sample_categorical_onehot
from sbayes_tpu.model.model import Model
from sbayes_tpu.model.posterior import Posterior
from sbayes_tpu.sampling.conditionals import Conditionals
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


# All variant names accepted as positional filters (kept in sync with the
# two variant lists in main() via asserts there).
VARIANT_NAMES = (
    "v_full", "v_fixed_sel", "v_no_back", "v_no_delta", "v_no_sp",
    "v_no_pat", "v_min",
    "s_full", "s_no_back", "s_no_delta", "s_min", "s_min_fixed",
    "s_no_qback", "s_no_outs", "s_no_sp", "s_no_pat", "s_full+dll",
    "s_full+scat", "s_full_fixed", "s2_base", "s2_sorted", "s2_mm",
    "s2_stackb", "s2_2step", "s2_all", "s2_mm+stk", "s_onehot",
)


def main(B=1024, only=()):
    unknown = [n for n in only if n not in VARIANT_NAMES]
    if unknown:
        raise SystemExit(
            f"unknown variant name(s) {unknown}; valid: {', '.join(VARIANT_NAMES)}")
    data = synthetic_data(n_objects=100, n_features=36, n_states=6,
                          n_families=6, seed=0)
    config = synthetic_config(n_clusters=3, geo_prior="uniform")
    model = Model(data, config.model)
    rt = SamplerRuntime(model, config.mcmc, sample_from_prior=False)
    t0 = time.perf_counter()
    states = rt.init_chains(jax.random.PRNGKey(0), B)
    states = _refresh_states_jit(rt.consts, rt.sample_from_prior, states)
    jax.block_until_ready(states)
    print(f"setup: init_chains({B}) {time.perf_counter()-t0:.1f}s", flush=True)
    cond = Conditionals(Posterior(rt.consts, False), 1.0, 1.0)
    consts = cond.consts
    N = consts.N
    m = 20
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    feats = jnp.asarray(consts.features)
    na = jnp.asarray(consts.na)
    hc_conf = jnp.asarray(consts.hc_conf)

    from sbayes_tpu.sampling.operators import OperatorFactory
    fac = OperatorFactory(cond, p_grow=0.5)

    def make_variant(fixed_sel=False, back=True, delta=True, sp=True,
                     pat=True, minimal=False):
        def op(key, state):
            k_sel, k_draw = jax.random.split(key)
            counts_old = (state.cl_counts, state.conf_counts)
            if fixed_sel or minimal:
                obj_idx = jnp.arange(m)
            else:
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
            if minimal:
                return log_q, new_rows.sum()

            if delta:
                counts_new = cond.delta_counts_rows(
                    counts_old, state.clusters, obj_idx, valid,
                    old_rows, new_rows, feats_m)
            else:
                counts_new = counts_old
            if pat and state.pat_counts is not None:
                pat_new = fac._delta_pat(state.pat_counts, obj_idx, valid,
                                         hc0, hc0, old_rows, new_rows)
            else:
                pat_new = state.pat_counts
            if back:
                p_back = cond.source_posterior_rows(
                    state.clusters, state.weights, counts_new, obj_idx,
                    feats_m, na_m)
            else:
                p_back = p
            log_q_back = cond._rows_logp(p_back, old_rows, valid, na_m)
            if sp:
                sp_delta = (
                    cond.source_prior_rows_logp(state.weights, hc_m, new_rows, valid, na_m)
                    - cond.source_prior_rows_logp(state.weights, hc_m, old_rows, valid, na_m))
            else:
                sp_delta = jnp.zeros(())
            out = (log_q, log_q_back, sp_delta,
                   counts_new[0].sum(), counts_new[1].sum(),
                   (0.0 if pat_new is None else pat_new.sum()))
            return out
        return jax.jit(jax.vmap(op))

    variants = [
        ("v_full", make_variant()),
        ("v_fixed_sel", make_variant(fixed_sel=True)),
        ("v_no_back", make_variant(back=False)),
        ("v_no_delta", make_variant(delta=False)),
        ("v_no_sp", make_variant(sp=False)),
        ("v_no_pat", make_variant(pat=False)),
        ("v_min", make_variant(minimal=True)),
    ]
    assert {n for n, _ in variants} <= set(VARIANT_NAMES), "VARIANT_NAMES drifted"
    for name, fn in variants:
        if only and name not in only:
            continue
        print(f"{name:12s}: {timeit(fn, keys, states):7.3f} ms", flush=True)

    # ---- scan-based: amortizes the per-dispatch tunnel floor; matches the
    # in-chunk cost the family probe sees. Each step folds a scalar from
    # the op into the carry so nothing is dead-code-eliminated.
    STEPS = 50

    def scanned(op_fn, extra=None):
        def run(keys2, states2):
            def body(carry, k):
                ks = jax.random.split(k, B)
                out = jax.vmap(op_fn)(ks, states2)
                acc = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                if extra is not None:
                    acc = acc + extra(states2, ks)
                return carry + acc, None
            tot, _ = lax.scan(body, jnp.zeros(()), keys2)
            return tot
        return jax.jit(run)

    def raw(op):
        # unwrap: make_variant returns jitted vmap; rebuild raw per-chain fn
        return op

    # rebuild per-chain (unvmapped) closures for scan use
    def make_raw(**kw):
        f = make_variant(**kw)
        return f._fun if hasattr(f, "_fun") else None

    # simpler: re-create the body functions directly
    def per_chain(fixed_sel=False, back=True, delta=True, sp=True,
                  pat=True, minimal=False, qback=True, outs=True):
        vf = make_variant(fixed_sel=fixed_sel, back=back, delta=delta,
                          sp=sp, pat=pat, minimal=minimal)
        del vf

        def op(key, state):
            k_sel, k_draw = jax.random.split(key)
            counts_old = (state.cl_counts, state.conf_counts)
            if fixed_sel or minimal:
                obj_idx = jnp.arange(m)
            else:
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
            if minimal:
                # keep old_rows + hc gathers live so dynamic const gathers
                # are not dead-code-eliminated
                return (log_q, old_rows.sum(), hc_m.sum())
            if delta:
                counts_new = cond.delta_counts_rows(
                    counts_old, state.clusters, obj_idx, valid,
                    old_rows, new_rows, feats_m)
            else:
                counts_new = counts_old
            if pat and state.pat_counts is not None:
                pat_new = fac._delta_pat(state.pat_counts, obj_idx, valid,
                                         hc0, hc0, old_rows, new_rows)
            else:
                pat_new = state.pat_counts
            if back:
                p_back = cond.source_posterior_rows(
                    state.clusters, state.weights, counts_new, obj_idx,
                    feats_m, na_m)
            else:
                p_back = p
            if qback:
                log_q_back = cond._rows_logp(p_back, old_rows, valid, na_m)
            else:
                log_q_back = log_q + p_back.sum() * 0.0
            if sp:
                sp_delta = (
                    cond.source_prior_rows_logp(state.weights, hc_m, new_rows, valid, na_m)
                    - cond.source_prior_rows_logp(state.weights, hc_m, old_rows, valid, na_m))
            else:
                sp_delta = jnp.zeros(())
            if not outs:
                return (log_q, log_q_back, sp_delta)
            return (log_q, log_q_back, sp_delta,
                    counts_new[0].sum() * 1e-6, counts_new[1].sum() * 1e-6,
                    (jnp.zeros(()) if pat_new is None else pat_new.sum() * 1e-6))
        return op

    def d_ll_extra(states2, ks):
        # the kernel's generic d_ll: lane-packed gammaln-stack diff
        def f(state):
            return cond.post.log_likelihood_diff_from_counts(
                (state.cl_counts + 1.0, state.conf_counts + 1.0),
                (state.cl_counts, state.conf_counts))
        return jax.vmap(f)(states2).sum()

    def scatter_extra(states2, ks):
        from sbayes_tpu.model.math import scatter_rows
        def f(state, k):
            idx = jax.random.randint(k, (m,), 0, N)
            rows = gather_rows(state.source, idx)
            return scatter_rows(state.source, idx, rows).sum() * 1e-6
        return jax.vmap(f)(states2, ks).sum()

    # ---- one-hot packed const-gather variant: every per-chain gather from
    # a shared const tensor (feats, na, hc_conf, groups, clusters rows)
    # rides ONE one-hot MXU matmul instead of vmapped TPU gathers.
    F, S, C = consts.F, consts.S, consts.C
    n_conf = len(consts.conf_names)
    G = consts.Gmax
    groups_t = jnp.asarray(consts.groups)                      # (C-1, G, N)
    packed = jnp.concatenate([
        feats.reshape(N, F * S).astype(jnp.float32),
        na.astype(jnp.float32),
        hc_conf.astype(jnp.float32),
        groups_t.reshape(n_conf * G, N).T.astype(jnp.float32),
    ], axis=1)                                                  # (N, X)

    def op_onehot(key, state):
        k_sel, k_draw = jax.random.split(key)
        counts_old = (state.cl_counts, state.conf_counts)
        obj_idx = jax.random.choice(k_sel, N, shape=(m,), replace=False)
        valid = jnp.ones(m, bool)
        oh = jax.nn.one_hot(obj_idx, N, dtype=jnp.float32)      # (m, N)
        gath = jnp.dot(oh, packed, preferred_element_type=jnp.float32)
        o = 0
        feats_m = gath[:, o:o + F * S].reshape(m, F, S); o += F * S
        na_m = gath[:, o:o + F] > 0.5; o += F
        hc_conf_m = gath[:, o:o + n_conf] > 0.5; o += n_conf
        g_m = gath[:, o:o + n_conf * G].reshape(m, n_conf, G)
        g_m = jnp.moveaxis(g_m, 0, -1)                          # (C-1, G, m)
        cl_m = jnp.einsum("kn,mn->km", state.clusters.astype(jnp.float32), oh,
                          preferred_element_type=jnp.float32)   # (K, m)
        old_rows = gather_rows(state.source, obj_idx)
        hc0 = cl_m.sum(0) > 0.5
        hc_m = jnp.concatenate([hc0[:, None], hc_conf_m], axis=1)

        # forward posterior (source_posterior_rows inlined on gathered consts)
        cl_counts, conf_counts = counts_old
        cl_eff = normalize(cl_counts + jnp.asarray(consts.conc_cluster)[None], axis=-1)
        lh0 = jnp.einsum("km,kfs,mfs->mf", cl_m, cl_eff, feats_m,
                         preferred_element_type=jnp.float32)
        conf_eff = normalize(conf_counts + jnp.asarray(consts.conc_conf), axis=-1)
        lhc = jnp.einsum("cgm,cgfs,mfs->mfc", g_m, conf_eff, feats_m,
                         preferred_element_type=jnp.float32)
        lh = jnp.concatenate([lh0[:, :, None], lhc], axis=-1)
        lh = jnp.where(na_m[:, :, None], 1.0, lh)
        w = normalize_weights(state.weights, hc_m)
        p = normalize(lh * w, axis=-1)

        x = sample_categorical_onehot(k_draw, p) & ~na_m[:, :, None]
        new_rows = jnp.where(valid[:, None, None], x, old_rows)
        log_q = cond._rows_logp(p, new_rows, valid, na_m)

        # delta counts (inlined, reusing cl_m/g_m)
        d0 = (new_rows[:, :, 0].astype(jnp.float32)
              - old_rows[:, :, 0].astype(jnp.float32))
        delta_cl = jnp.einsum("km,mf,mfs->kfs", cl_m, d0, feats_m,
                              preferred_element_type=jnp.float32)
        dc = (new_rows[:, :, 1:].astype(jnp.float32)
              - old_rows[:, :, 1:].astype(jnp.float32))
        delta_conf = jnp.einsum("cgm,mfc,mfs->cgfs", g_m, dc, feats_m,
                                preferred_element_type=jnp.float32)
        counts_new = (cl_counts + delta_cl, conf_counts + delta_conf)

        pat_new = fac._delta_pat(state.pat_counts, obj_idx, valid,
                                 hc0, hc0, old_rows, new_rows)

        # backward posterior from new counts, same gathered consts
        cl_eff2 = normalize(counts_new[0] + jnp.asarray(consts.conc_cluster)[None], axis=-1)
        lh0b = jnp.einsum("km,kfs,mfs->mf", cl_m, cl_eff2, feats_m,
                          preferred_element_type=jnp.float32)
        conf_eff2 = normalize(counts_new[1] + jnp.asarray(consts.conc_conf), axis=-1)
        lhcb = jnp.einsum("cgm,cgfs,mfs->mfc", g_m, conf_eff2, feats_m,
                          preferred_element_type=jnp.float32)
        lhb = jnp.concatenate([lh0b[:, :, None], lhcb], axis=-1)
        lhb = jnp.where(na_m[:, :, None], 1.0, lhb)
        p_back = normalize(lhb * w, axis=-1)
        log_q_back = cond._rows_logp(p_back, old_rows, valid, na_m)

        sp_delta = (
            cond.source_prior_rows_logp(state.weights, hc_m, new_rows, valid, na_m)
            - cond.source_prior_rows_logp(state.weights, hc_m, old_rows, valid, na_m))
        return (log_q, log_q_back, sp_delta,
                counts_new[0].sum() * 1e-6, counts_new[1].sum() * 1e-6,
                (jnp.zeros(()) if pat_new is None else pat_new.sum() * 1e-6))

    # ---- alternative formulations (in-scan) ------------------------------
    conc_cl_c = jnp.asarray(consts.conc_cluster)          # (F, S)
    conc_conf_c = jnp.asarray(consts.conc_conf)           # (C-1, G, F, S)
    K = consts.K

    def per_chain2(sel="rand", mm_delta=False, stacked_back=False,
                   twostep_post=False):
        """Full op with alternative formulations:
        sel: 'rand' (choice w/o replacement) | 'fixed' (arange) |
             'sorted' (choice then sort)
        mm_delta: delta counts as flattened (rows x m)@(m x F*S) matmuls
        stacked_back: fwd+bwd effect tables built in ONE stacked einsum
        twostep_post: posterior einsums as (m x K)@(K x F*S) matmul then
             VPU reduce against feats (instead of 3-operand einsums)
        """
        def post_rows(cl_m, g_m, counts, feats_m, na_m, hc_m, weights):
            cl_counts, conf_counts = counts
            cl_eff = normalize(cl_counts + conc_cl_c[None], axis=-1)
            conf_eff = normalize(conf_counts + conc_conf_c, axis=-1)
            if twostep_post:
                E0 = jnp.dot(cl_m.T, cl_eff.reshape(K, -1),
                             preferred_element_type=jnp.float32)
                lh0 = (E0.reshape(m, F, S) * feats_m).sum(-1)
                lhc_list = []
                for c_i in range(n_conf):
                    Ec = jnp.dot(g_m[c_i].T, conf_eff[c_i].reshape(G, -1),
                                 preferred_element_type=jnp.float32)
                    lhc_list.append((Ec.reshape(m, F, S) * feats_m).sum(-1))
                lhc = jnp.stack(lhc_list, axis=-1)
            else:
                lh0 = jnp.einsum("km,kfs,mfs->mf", cl_m, cl_eff, feats_m,
                                 preferred_element_type=jnp.float32)
                lhc = jnp.einsum("cgm,cgfs,mfs->mfc", g_m, conf_eff, feats_m,
                                 preferred_element_type=jnp.float32)
            lh = jnp.concatenate([lh0[:, :, None], lhc], axis=-1)
            lh = jnp.where(na_m[:, :, None], 1.0, lh)
            w = normalize_weights(weights, hc_m)
            return normalize(lh * w, axis=-1), w

        def post_rows_both(cl_m, g_m, counts_a, counts_b, feats_m, na_m, w):
            cl_b = jnp.stack([counts_a[0], counts_b[0]])          # (2,K,F,S)
            conf_b = jnp.stack([counts_a[1], counts_b[1]])        # (2,C-1,G,F,S)
            cl_eff = normalize(cl_b + conc_cl_c[None, None], axis=-1)
            conf_eff = normalize(conf_b + conc_conf_c[None], axis=-1)
            lh0 = jnp.einsum("km,bkfs,mfs->bmf", cl_m, cl_eff, feats_m,
                             preferred_element_type=jnp.float32)
            lhc = jnp.einsum("cgm,bcgfs,mfs->bmfc", g_m, conf_eff, feats_m,
                             preferred_element_type=jnp.float32)
            lh = jnp.concatenate([lh0[..., None], lhc], axis=-1)
            lh = jnp.where(na_m[None, :, :, None], 1.0, lh)
            p2 = normalize(lh * w[None], axis=-1)
            return p2[0], p2[1]

        def op(key, state):
            k_sel, k_draw = jax.random.split(key)
            counts_old = (state.cl_counts, state.conf_counts)
            if sel == "fixed":
                obj_idx = jnp.arange(m)
            else:
                obj_idx = jax.random.choice(k_sel, N, shape=(m,), replace=False)
                if sel == "sorted":
                    obj_idx = jnp.sort(obj_idx)
            valid = jnp.ones(m, bool)
            feats_m = feats[obj_idx].astype(jnp.float32)
            na_m = na[obj_idx]
            old_rows = gather_rows(state.source, obj_idx)
            hc_conf_m = hc_conf[obj_idx]
            hc0 = jnp.any(state.clusters[:, obj_idx], axis=0)
            hc_m = jnp.concatenate([hc0[:, None], hc_conf_m], axis=1)
            cl_m = state.clusters[:, obj_idx].astype(jnp.float32)   # (K, m)
            g_m = groups_t[:, :, obj_idx].astype(jnp.float32)       # (C-1,G,m)

            p, w = post_rows(cl_m, g_m, counts_old, feats_m, na_m, hc_m,
                             state.weights)
            x = sample_categorical_onehot(k_draw, p) & ~na_m[:, :, None]
            new_rows = jnp.where(valid[:, None, None], x, old_rows)
            log_q = cond._rows_logp(p, new_rows, valid, na_m)

            if mm_delta:
                d0 = (new_rows[:, :, 0].astype(jnp.float32)
                      - old_rows[:, :, 0].astype(jnp.float32))      # (m, F)
                V0 = (d0[:, :, None] * feats_m).reshape(m, -1)      # (m, F*S)
                delta_cl = jnp.dot(cl_m, V0,
                                   preferred_element_type=jnp.float32
                                   ).reshape(K, F, S)
                dc = (new_rows[:, :, 1:].astype(jnp.float32)
                      - old_rows[:, :, 1:].astype(jnp.float32))     # (m,F,C-1)
                dconf = []
                for c_i in range(n_conf):
                    Vc = (dc[:, :, c_i][:, :, None] * feats_m).reshape(m, -1)
                    dconf.append(jnp.dot(g_m[c_i], Vc,
                                         preferred_element_type=jnp.float32
                                         ).reshape(G, F, S))
                counts_new = (counts_old[0] + delta_cl,
                              counts_old[1] + jnp.stack(dconf))
            else:
                counts_new = cond.delta_counts_rows(
                    counts_old, state.clusters, obj_idx, valid,
                    old_rows, new_rows, feats_m)
            pat_new = fac._delta_pat(state.pat_counts, obj_idx, valid,
                                     hc0, hc0, old_rows, new_rows)
            if stacked_back:
                p, p_back = post_rows_both(cl_m, g_m, counts_old, counts_new,
                                           feats_m, na_m, w)
            else:
                p_back, _ = post_rows(cl_m, g_m, counts_new, feats_m, na_m,
                                      hc_m, state.weights)
            log_q_back = cond._rows_logp(p_back, old_rows, valid, na_m)
            sp_delta = (
                cond.source_prior_rows_logp(state.weights, hc_m, new_rows, valid, na_m)
                - cond.source_prior_rows_logp(state.weights, hc_m, old_rows, valid, na_m))
            return (log_q, log_q_back, sp_delta,
                    counts_new[0].sum() * 1e-6, counts_new[1].sum() * 1e-6,
                    (jnp.zeros(()) if pat_new is None else pat_new.sum() * 1e-6))
        return op

    keys_scan = jax.random.split(jax.random.PRNGKey(11), STEPS)
    scan_variants = [
        ("s_full", per_chain(), None),
        ("s_no_back", per_chain(back=False), None),
        ("s_no_delta", per_chain(delta=False), None),
        ("s_min", per_chain(minimal=True), None),
        ("s_min_fixed", per_chain(minimal=True, fixed_sel=True), None),
        ("s_no_qback", per_chain(qback=False), None),
        ("s_no_outs", per_chain(outs=False), None),
        ("s_no_sp", per_chain(sp=False), None),
        ("s_no_pat", per_chain(pat=False), None),
        ("s_full+dll", per_chain(), d_ll_extra),
        ("s_full+scat", per_chain(), scatter_extra),
        ("s_full_fixed", per_chain(fixed_sel=True), None),
        ("s2_base", per_chain2(), None),
        ("s2_sorted", per_chain2(sel="sorted"), None),
        ("s2_mm", per_chain2(mm_delta=True), None),
        ("s2_stackb", per_chain2(stacked_back=True), None),
        ("s2_2step", per_chain2(twostep_post=True), None),
        ("s2_all", per_chain2(mm_delta=True, stacked_back=True,
                              twostep_post=True), None),
        ("s2_mm+stk", per_chain2(mm_delta=True, stacked_back=True), None),
        ("s_onehot", op_onehot, None),
    ]
    assert {n for n, _, _ in scan_variants} <= set(VARIANT_NAMES), "VARIANT_NAMES drifted"
    for name, opf, ex in scan_variants:
        if only and name not in only:
            continue
        fn = scanned(opf, extra=ex)
        t = timeit(fn, keys_scan, states, reps=5) / STEPS
        print(f"{name:12s}: {t:7.3f} ms/step (in-scan)", flush=True)


if __name__ == "__main__":
    # Usage: probe.py [chains] [variant ...] — the chain count may only be
    # the FIRST argument; a numeric arg anywhere else is almost certainly a
    # misplaced chain count, so error instead of silently dropping it.
    _args = sys.argv[1:]
    _B = int(_args[0]) if _args and _args[0].isdigit() else 1024
    _rest = _args[1:] if _args and _args[0].isdigit() else _args
    _stray = [a for a in _rest if a.isdigit()]
    if _stray:
        raise SystemExit(
            f"numeric argument(s) {_stray} not in the leading position; "
            "usage: source_ablation_probe.py [chains] [variant ...]")
    main(_B, tuple(_rest))
