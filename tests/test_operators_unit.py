"""Operator-level unit tests: invariants and oracles for the subtle parts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp



pytestmark = pytest.mark.smoke

@pytest.fixture(scope="module")
def setup():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=24, n_features=6, n_states=4, n_families=3, seed=11)
    config = synthetic_config(n_clusters=2, geo_prior="cost_based", rate=1e6)
    model = Model(data, config.model)
    cond = Conditionals(model.posterior)
    state = generate_prior_sample(jax.random.PRNGKey(4), cond)
    state = jax.jit(cond.post.fill_state)(state)
    return model, cond, state, config


def _check_invariants(model, st):
    src = np.asarray(st.source)
    na = np.asarray(model.consts.na)
    assert np.all(src[na].sum(-1) == 0), "NA rows must stay zero"
    assert np.all(src[~na].sum(-1) == 1), "valid rows must stay one-hot"
    assert np.asarray(st.clusters).sum(0).max() <= 1, "clusters must stay disjoint"


@pytest.mark.parametrize("op_name", [
    "cluster_naive_n1", "cluster_gibbsish", "cluster_gibbsish_geo",
    "gibbsish_sample_cluster_wide_geo", "cluster_jump_gibbsish",
    "gibbs_sample_sources", "gibbs_sample_sources_groups", "gibbs_sample_weights",
])
def test_operator_invariants(setup, op_name):
    from sbayes_tpu.sampling.operators import (
        get_operator_schedule, resolve_result_state)

    model, cond, state, config = setup
    ops = {o.name: o for o in get_operator_schedule(cond, config.mcmc.operators)}
    op = ops[op_name]

    for i in range(5):
        res = jax.jit(op.fn)(jax.random.PRNGKey(100 + i), state)
        st = resolve_result_state(res)  # materialize deferred source rows
        _check_invariants(model, st)
        # q values: log_q_back == -inf means direct reject (state unchanged)
        if np.isneginf(float(res.log_q_back)):
            np.testing.assert_array_equal(np.asarray(st.clusters), np.asarray(state.clusters))
        else:
            assert np.isfinite(float(res.log_q)) or np.isneginf(float(res.log_q))  # gibbs sentinel ok


def test_weights_stay_normalized(setup):
    from sbayes_tpu.sampling.operators import get_operator_schedule

    model, cond, state, config = setup
    ops = {o.name: o for o in get_operator_schedule(cond, config.mcmc.operators)}
    res = jax.jit(ops["gibbs_sample_weights"].fn)(jax.random.PRNGKey(0), state)
    w = np.asarray(res.state.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert np.all(w >= 0)


def test_geo_costs_per_object_oracle(setup):
    """get_costs_per_object matches a scipy-MST NumPy oracle."""
    from scipy.sparse.csgraph import minimum_spanning_tree

    model, cond, state, config = setup
    c = model.consts
    cost = np.asarray(c.cost_matrix, float)
    cluster = np.asarray(state.clusters[0])
    m = cluster.sum()

    got = np.asarray(
        jax.jit(lambda cl: cond.post.geo_prior_costs_per_object(cl, 0))(state.clusters)
    )

    # oracle (aggregation=mean is the synthetic_config default for cost_based)
    sub = cost[np.ix_(cluster, cluster)]
    mst = minimum_spanning_tree(sub)
    edges = np.asarray(mst.tocsr()[mst.nonzero()]).ravel()
    aggr_before = edges.mean() if len(edges) else 0.0
    cost_to_cluster = cost[cluster].min(axis=0)
    aggr_after = (cost_to_cluster + m * aggr_before) / (1 + m)
    scale = c.geo.scale
    want = (-aggr_after / scale) - (-aggr_before / scale)

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_leave_subset_out_counts_oracle(setup):
    """component_likelihood_given_unchanged uses counts that exclude the
    subset's own contribution (NumPy oracle)."""
    model, cond, state, config = setup
    c = model.consts
    feats = np.asarray(c.features)
    src = np.asarray(state.source).astype(float)
    clusters = np.asarray(state.clusters)
    subset = np.zeros(c.N, bool)
    subset[[1, 3, 5]] = True

    lh = np.asarray(
        jax.jit(lambda: cond.component_likelihood_given_unchanged(
            state.clusters, state.source, jnp.asarray(subset), 0
        ))()
    )

    # oracle for the cluster component at a subset object
    keep = clusters[0] & ~subset
    counts = np.einsum("n,nf,nfs->fs", keep.astype(float), src[:, :, 0], feats)
    conc = np.asarray(c.conc_cluster)
    unif = np.asarray(c.unif_conc)
    eff = (unif + (conc - unif) / 1.0 + counts / 1.0)
    eff = eff / eff.sum(-1, keepdims=True)
    o = 3
    want = np.einsum("fs,fs->f", eff, feats[o])
    na_o = np.asarray(c.na)[o]
    want = np.where(na_o, 1.0, want)
    np.testing.assert_allclose(lh[o, :, 0], want, rtol=2e-4, atol=1e-6)


def test_posterior_consistency_after_specialized_updates(setup):
    """prior_parts stays consistent with a full recompute through a mix of
    operator applications (the invariant behind the static cache)."""
    from sbayes_tpu.sampling.kernel import make_mh_apply_fn
    from sbayes_tpu.sampling.operators import get_operator_schedule

    model, cond, state, config = setup
    ops = get_operator_schedule(cond, config.mcmc.operators)
    apply = jax.jit(make_mh_apply_fn(cond, ops))

    st = state
    key = jax.random.PRNGKey(42)
    for i in range(len(ops)):
        key, k = jax.random.split(key)
        st, _accept, _ss, _nf = apply(jnp.int32(i % len(ops)), k, st)

    parts = jax.jit(cond.post.parts)(st)
    np.testing.assert_allclose(float(st.log_lh), float(parts.log_lh), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(st.log_prior), float(parts.log_prior), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(st.prior_parts), np.asarray(parts.prior_vector()), rtol=1e-4, atol=1e-3
    )
