"""The gibbsish membership marginal's closed-form weight mixture must match
the direct dense formula (reference operators.py:1035-1095): the production
code avoids (N, F, C) weight tensors via
    lh = Σ_c wh[f,c]·avail[n,c]·lh_c / Σ_c wh[f,c]·avail[n,c],
this test rebuilds the dense normalize-then-mix version and compares."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import OperatorFactory
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=23, n_features=7, n_states=4, n_families=3, seed=3)
    config = synthetic_config(n_clusters=2, geo_prior="cost_based", rate=1e6)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.3, 1.7)  # heated (MC3-style)
    fact = OperatorFactory(cond)
    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(2))
    state = jax.jit(cond.post.fill_state)(state)
    return model, cond, fact, state


def _dense_marginal(cond, fact, state, i_cluster, heat_effect_lh):
    """The direct (N,F,C) formula the production closed form replaces."""
    from sbayes_tpu.model.math import normalize, normalize_weights

    c = cond.consts
    counts = cond.post.feature_counts(state.clusters, state.source)
    cl_counts, conf_counts = counts
    feats = jnp.asarray(c.features).astype(jnp.float32)
    na = jnp.asarray(c.na)

    p_eff = fact.cluster_effect_proposal_gibbs(state, cl_counts, conf_counts, i_cluster)
    cluster_lh = jnp.einsum("fs,nfs->nf", p_eff, feats)
    if heat_effect_lh:
        cluster_lh = jnp.maximum(cluster_lh, 1e-35) ** (1.0 / fact.T)

    all_lh = cond.likelihood_per_component_slice(
        state.clusters, cl_counts, conf_counts, feats, na,
        jnp.asarray(c.conc_cluster), jnp.asarray(c.conc_conf),
    )
    all_lh = all_lh.at[:, :, 0].set(jnp.where(na, 1.0, cluster_lh))

    hc = cond.post.has_components(state.clusters)
    hc_flip = hc.at[:, 0].set(~hc[:, 0])
    in_now = hc[:, 0]
    w_cur = normalize(normalize_weights(state.weights, hc) ** (1.0 / fact.Tp), axis=-1)
    w_flip = normalize_weights(state.weights ** (1.0 / fact.Tp), hc_flip)
    w_with = jnp.where(in_now[:, None, None], w_cur, w_flip)
    w_without = jnp.where(in_now[:, None, None], w_flip, w_cur)
    lh_with = jnp.einsum("nfc,nfc->nf", all_lh, w_with)
    lh_without = jnp.einsum("nfc,nfc->nf", all_lh, w_without)
    log_m1 = jnp.log(jnp.maximum(lh_with, 1e-35)).sum(-1)
    log_m0 = jnp.log(jnp.maximum(lh_without, 1e-35)).sum(-1)
    return log_m0 / fact.T, log_m1 / fact.T


@pytest.mark.parametrize("heat_effect_lh", [False, True])
@pytest.mark.parametrize("i_cluster", [0, 1])
def test_closed_form_matches_dense(setup, i_cluster, heat_effect_lh):
    model, cond, fact, state = setup
    # absolute marginals (the test-oracle form)
    m0, m1 = jax.jit(
        lambda s: fact._log_marginal_with_without(
            s, i_cluster, jnp.ones(model.consts.N, bool),
            heat_effect_lh=heat_effect_lh)
    )(state)
    d0, d1 = jax.jit(
        lambda s: _dense_marginal(cond, fact, s, i_cluster, heat_effect_lh)
    )(state)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(d0), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(d1), rtol=2e-4, atol=2e-4)

    # log-odds form (what production proposals consume): one log/element
    odds = jax.jit(
        lambda s: fact._cluster_log_odds(
            s, i_cluster, jnp.ones(model.consts.N, bool),
            heat_effect_lh=heat_effect_lh)
    )(state)
    np.testing.assert_allclose(np.asarray(odds), np.asarray(d1 - d0),
                               rtol=2e-4, atol=2e-4)
