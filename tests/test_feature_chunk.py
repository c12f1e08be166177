"""Feature-tiled (lax.map over F-tiles) vs fully fused path equivalence.

The scale path (``ModelConstants.feature_chunk``, used for the 10k x 5k
workload) must be mathematically identical to the fused path: counts,
priors, membership marginals, jump likelihoods and proposal densities all
agree to float tolerance on a small model with the chunking forced on.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=16, n_features=6, n_states=4, n_families=2, seed=5)
    config = synthetic_config(n_clusters=2, geo_prior="cost_based", rate=1e6)
    model = Model(data, config.model)
    consts = model.consts
    assert consts.feature_chunk is None  # small model: fused by default
    consts_chunked = dataclasses.replace(consts, feature_chunk=2)

    cond = Conditionals(Posterior(consts), 1.0, 1.0)
    cond_c = Conditionals(Posterior(consts_chunked), 1.0, 1.0)
    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(3))
    return cond, cond_c, state


def test_auto_feature_chunk_policy():
    from sbayes_tpu.model.constants import auto_feature_chunk

    assert auto_feature_chunk(100, 36) is None           # small: fused
    assert auto_feature_chunk(10_000, 5_000) == 500      # divisor near 512
    assert auto_feature_chunk(10_000, 5_120) == 512
    fc = auto_feature_chunk(10_000, 4_999)               # prime F
    assert fc is None or 4_999 % fc == 0


def test_counts_and_priors_match(setup):
    cond, cond_c, state = setup
    cl, conf = jax.jit(cond.post.feature_counts)(state.clusters, state.source)
    cl2, conf2 = jax.jit(cond_c.post.feature_counts)(state.clusters, state.source)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(cl2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(conf2), rtol=1e-6)

    sp = jax.jit(cond.post.source_prior)(state.clusters, state.weights, state.source)
    sp2 = jax.jit(cond_c.post.source_prior)(state.clusters, state.weights, state.source)
    np.testing.assert_allclose(float(sp), float(sp2), rtol=1e-5)

    p = jax.jit(cond.post.parts)(state)
    p2 = jax.jit(cond_c.post.parts)(state)
    np.testing.assert_allclose(float(p.log_lh), float(p2.log_lh), rtol=1e-5)
    np.testing.assert_allclose(float(p.log_prior), float(p2.log_prior), rtol=1e-5)


def test_membership_marginals_match(setup):
    from sbayes_tpu.sampling.operators import OperatorFactory

    cond, cond_c, state = setup
    fact, fact_c = OperatorFactory(cond), OperatorFactory(cond_c)
    avail = jnp.ones(cond.consts.N, bool)
    for i_cluster in (0, 1):
        for heat in (False, True):
            m0, m1 = jax.jit(
                lambda s, i=i_cluster, h=heat: fact._log_marginal_with_without(
                    s, i, avail, heat_effect_lh=h)
            )(state)
            m0c, m1c = jax.jit(
                lambda s, i=i_cluster, h=heat: fact_c._log_marginal_with_without(
                    s, i, avail, heat_effect_lh=h)
            )(state)
            np.testing.assert_allclose(np.asarray(m0), np.asarray(m0c), rtol=2e-5)
            np.testing.assert_allclose(np.asarray(m1), np.asarray(m1c), rtol=2e-5)


def test_resample_densities_match(setup):
    cond, cond_c, state = setup
    N = cond.consts.N
    obj = int(np.flatnonzero(np.asarray(state.clusters[0]))[0])
    subset = jnp.zeros(N, bool).at[obj].set(True)
    clusters_new = state.clusters.at[0, obj].set(False).at[1, obj].set(True)

    # log_q_back scores the FIXED old source — deterministic, comparable
    for name in ("gibbs_resample_source", "gibbs_resample_source_jump"):
        if name == "gibbs_resample_source":
            args = dict(i_cluster=1)
        else:
            args = dict(i_cluster_new=1, i_cluster_old=0)
        rs = getattr(cond, name)(jax.random.PRNGKey(9), state, clusters_new, subset, **args)
        rs_c = getattr(cond_c, name)(jax.random.PRNGKey(9), state, clusters_new, subset, **args)
        np.testing.assert_allclose(float(rs.log_q_back), float(rs_c.log_q_back),
                                   rtol=1e-5, err_msg=name)


def test_tiled_source_op_density_matches_fused(setup):
    """The tiled source op's own draw must be scored by the FUSED full
    posterior exactly: log_q equals the fused density of the drawn source
    (subset = all 16 objects, since k_cap >= N makes random_subset select
    everything), and log_q_back the fused density of the old source under
    the new state."""
    from sbayes_tpu.sampling.operators import get_operator_schedule
    from sbayes_tpu.testing import synthetic_config

    cond, cond_c, state = setup

    config = synthetic_config(n_clusters=2)
    ops_c = get_operator_schedule(cond_c, config.mcmc.operators)
    from sbayes_tpu.sampling.operators import resolve_result_state

    src_op = [o for o in ops_c if o.name == "gibbs_sample_sources"][0]
    res = jax.jit(src_op.fn)(jax.random.PRNGKey(4), state)
    res = res._replace(state=resolve_result_state(res))

    N = cond.consts.N
    subset = jnp.ones(N, bool)
    p_full = jax.jit(cond.source_posterior)(state.clusters, state.weights, state.source)
    log_q_expected = cond._masked_source_logp(p_full, res.state.source, subset)
    np.testing.assert_allclose(float(res.log_q), float(log_q_expected), rtol=1e-5)

    # and the backward density against the fused posterior of the new state
    p_back_full = jax.jit(cond.source_posterior)(
        res.state.clusters, res.state.weights, res.state.source
    )
    log_qb_expected = cond._masked_source_logp(p_back_full, state.source, subset)
    np.testing.assert_allclose(float(res.log_q_back), float(log_qb_expected), rtol=1e-5)


def test_weights_op_matches_bitwise(setup):
    from sbayes_tpu.sampling.operators import get_operator_schedule
    from sbayes_tpu.testing import synthetic_config

    cond, cond_c, state = setup
    config = synthetic_config(n_clusters=2)
    ops_f = get_operator_schedule(cond, config.mcmc.operators)
    ops_c = get_operator_schedule(cond_c, config.mcmc.operators)
    w_op_f = [o for o in ops_f if o.name == "gibbs_sample_weights"][0]
    w_op_c = [o for o in ops_c if o.name == "gibbs_sample_weights"][0]
    r_f = jax.jit(w_op_f.fn)(jax.random.PRNGKey(6), state)
    r_c = jax.jit(w_op_c.fn)(jax.random.PRNGKey(6), state)
    # same RNG stream (the weights op draws no per-tile keys) and identical
    # counts -> identical proposals and accepts
    np.testing.assert_allclose(np.asarray(r_f.state.weights),
                               np.asarray(r_c.state.weights), rtol=1e-5)
