"""Carried-counts invariant: ChainState.cl_counts/conf_counts must equal a
full sufficient-statistic recompute after EVERY operator application.

The cluster operators maintain them as O(F·S) delta updates
(OperatorFactory._delta_counts) instead of the full O(N·F·S) einsum; the
counts are integer-valued f32, so equality is exact — any mismatch means a
wrong candidate log-likelihood in the MH ratio.
"""
import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def setup():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import (
        get_operator_schedule, resolve_result_state)
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=24, n_features=6, n_states=4, n_families=2, seed=7)
    config = synthetic_config(n_clusters=2, geo_prior="cost_based", rate=1e6)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ops = get_operator_schedule(cond, config.mcmc.operators)
    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(8))
    state = jax.jit(cond.post.fill_state)(state)
    return cond, ops, state


def test_state_counts_match_full_recompute(setup):
    from sbayes_tpu.sampling.operators import resolve_result_state

    cond, ops, state = setup
    assert state.cl_counts is not None, "fill_state must set the carried counts"
    for spec in ops:
        for seed in range(4):
            res = jax.jit(spec.fn)(jax.random.PRNGKey(100 + seed), state)
            assert res.state.cl_counts is not None, (
                f"{spec.name}: candidate state lost the carried counts"
            )
            st = resolve_result_state(res)  # materialize deferred source rows
            cl, conf = jax.jit(cond.post.feature_counts)(
                st.clusters, st.source
            )
            np.testing.assert_array_equal(
                np.asarray(res.state.cl_counts), np.asarray(cl),
                err_msg=f"{spec.name} seed {seed}: cluster counts diverge",
            )
            np.testing.assert_array_equal(
                np.asarray(res.state.conf_counts), np.asarray(conf),
                err_msg=f"{spec.name} seed {seed}: confounder counts diverge",
            )
            # carried availability-pattern counts (weights-likelihood
            # sufficient statistic) must also track the full recompute
            assert res.state.pat_counts is not None, (
                f"{spec.name}: candidate state lost the carried pattern counts"
            )
            pat = jax.jit(cond.post.pattern_counts)(st.clusters, st.source)
            np.testing.assert_array_equal(
                np.asarray(res.state.pat_counts), np.asarray(pat),
                err_msg=f"{spec.name} seed {seed}: pattern counts diverge",
            )


def test_counts_survive_a_kernel_chunk(setup):
    """After a scanned multi-step chunk (mixed accept/reject across all
    operator branches) the carried counts still match a full recompute."""
    from sbayes_tpu.sampling.kernel import Carry, OperatorStats, make_chunk_runner

    cond, ops, state = setup
    run = make_chunk_runner(cond, ops)
    carry = run(jax.random.PRNGKey(5), state, OperatorStats.zeros(len(ops)), 60)
    cl, conf = jax.jit(cond.post.feature_counts)(
        carry.state.clusters, carry.state.source
    )
    np.testing.assert_array_equal(np.asarray(carry.state.cl_counts), np.asarray(cl))
    np.testing.assert_array_equal(np.asarray(carry.state.conf_counts), np.asarray(conf))
    pat = jax.jit(cond.post.pattern_counts)(carry.state.clusters, carry.state.source)
    np.testing.assert_array_equal(np.asarray(carry.state.pat_counts), np.asarray(pat))
    # carried prior decomposition (incl. delta-updated source prior) must
    # track a full recompute
    parts = jax.jit(cond.post.parts)(carry.state)
    np.testing.assert_allclose(np.asarray(carry.state.prior_parts),
                               np.asarray(parts.prior_vector()),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(carry.state.log_lh), float(parts.log_lh),
                               rtol=1e-4, atol=1e-3)


def test_ll_delta_matches_full_recompute(setup):
    """OpResult.ll_delta (math.dirichlet_categorical_delta over the touched
    count rows) must equal log_likelihood_from_counts(new) - (old) for the
    single-object movers, across accept-branch proposals."""
    cond, ops, state = setup
    single_movers = [s for s in ops if s.name in (
        "cluster_naive_n1", "cluster_gibbsish_geo", "cluster_naive_n1_geo",
        "cluster_naive_n2_geo", "cluster_gibbsish", "cluster_jump_gibbsish")]
    assert single_movers, "no single-object movers in schedule"
    ll_old = float(jax.jit(cond.post.log_likelihood_from_counts)(
        state.cl_counts, state.conf_counts))
    checked = 0
    for spec in single_movers:
        for seed in range(6):
            res = jax.jit(spec.fn)(jax.random.PRNGKey(500 + seed), state)
            assert res.ll_delta is not None, f"{spec.name}: no ll_delta"
            ll_new = float(jax.jit(cond.post.log_likelihood_from_counts)(
                res.state.cl_counts, res.state.conf_counts))
            if ll_new == ll_old and float(res.ll_delta) == 0.0:
                continue  # rejected proposal (sentinel zero delta)
            np.testing.assert_allclose(
                float(res.ll_delta), ll_new - ll_old, rtol=2e-4, atol=2e-3,
                err_msg=f"{spec.name} seed {seed}",
            )
            checked += 1
    assert checked >= 5, f"only {checked} informative proposals — vacuous"


def test_sweep_ll_delta_matches_full_recompute(monkeypatch):
    """The source sweep's free ll_delta (predictive-ratio telescoping in
    the scan body) must equal log_likelihood_from_counts(new) - (old): the
    MH kernel carries log_lh through forced-accept sweeps without any
    lgamma pass, so an error here silently corrupts every later MH ratio
    and the MC3 swap criterion."""
    monkeypatch.setenv("SBAYES_TPU_SOURCE_SWEEP", "1")
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import get_operator_schedule
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=24, n_features=6, n_states=4,
                          n_families=2, seed=7)
    config = synthetic_config(n_clusters=2, geo_prior="uniform")
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ops = get_operator_schedule(cond, config.mcmc.operators)
    sweeps = [s for s in ops if s.changes == "source" and s.forced_accept]
    assert sweeps, "SBAYES_TPU_SOURCE_SWEEP=1 must schedule the sweep ops"
    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(8))
    state = jax.jit(cond.post.fill_state)(state)
    ll_old = float(jax.jit(cond.post.log_likelihood_from_counts)(
        state.cl_counts, state.conf_counts))
    checked = 0
    for spec in sweeps:
        for seed in range(5):
            res = jax.jit(spec.fn)(jax.random.PRNGKey(900 + seed), state)
            assert res.ll_delta is not None, f"{spec.name}: sweep lost ll_delta"
            ll_new = float(jax.jit(cond.post.log_likelihood_from_counts)(
                res.state.cl_counts, res.state.conf_counts))
            np.testing.assert_allclose(
                float(res.ll_delta), ll_new - ll_old, rtol=2e-4, atol=2e-3,
                err_msg=f"{spec.name} seed {seed}")
            if abs(ll_new - ll_old) > 1e-6:
                checked += 1
    assert checked >= 5, f"only {checked} informative sweeps — vacuous"


def test_ll_diff_lane_packed_matches_per_feature(setup):
    """The lane-packed gammaln-stack diff (kernel's generic d_ll) must
    match the per-feature two-pass difference to f32 noise, and be exactly
    0.0 for identical counts (bitwise cancellation)."""
    cond, ops, state = setup
    post = cond.post
    counts_old = (state.cl_counts, state.conf_counts)
    z = jax.jit(post.log_likelihood_diff_from_counts)(counts_old, counts_old)
    assert float(z) == 0.0
    for seed in range(6):
        k = jax.random.PRNGKey(40 + seed)
        d_cl = jax.random.randint(k, state.cl_counts.shape, 0, 2).astype(np.float32)
        d_cl = d_cl * (np.asarray(state.cl_counts) > 0)  # keep counts valid-ish
        counts_new = (state.cl_counts + d_cl, state.conf_counts)
        ref = float(
            jax.jit(post.log_likelihood_from_counts)(*counts_new)
            - jax.jit(post.log_likelihood_from_counts)(*counts_old))
        got = float(jax.jit(post.log_likelihood_diff_from_counts)(
            counts_new, counts_old))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
