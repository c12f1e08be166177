"""Carried geo-skeleton invariant tests.

ChainState.geo_agg caches each cluster's skeleton aggregate (total /
n_edges / max edge cost); operators re-derive only the cluster(s) they
change. These tests assert the carried values stay EXACTLY equal to a
fresh recompute after sampling, and that the geo prior entering the MH
kernel matches the full-recompute oracle (the analogue of the
reference's cache-coherence self-checks, sbayes/sampling/mcmc.py:109-111).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbayes_tpu.model.model import Model
from sbayes_tpu.sampling.kernel import OperatorStats
from sbayes_tpu.sampling.runner import SamplerRuntime
from sbayes_tpu.testing import synthetic_config, synthetic_data


def _runtime(geo_prior="cost_based", aggregation="mean", n_clusters=3):
    data = synthetic_data(n_objects=30, n_features=8, n_states=3,
                          n_families=2, seed=3)
    config = synthetic_config(n_clusters=n_clusters, geo_prior=geo_prior,
                              rate=1e5)
    if geo_prior == "cost_based":
        from sbayes_tpu.config.schema import GeoPriorConfig

        config.model.prior.geo.aggregation = GeoPriorConfig.AggregationStrategies(aggregation)
    model = Model(data, config.model)
    return SamplerRuntime(model, config.mcmc, sample_from_prior=False)


@pytest.mark.parametrize("aggregation", ["mean", "sum", "max"])
def test_geo_agg_invariant_after_chunk(aggregation):
    rt = _runtime(aggregation=aggregation)
    from sbayes_tpu.model.posterior import Posterior

    post = Posterior(rt.consts, rt.sample_from_prior)
    assert post.carry_geo

    n_chains = 2
    states = rt.init_chains(jax.random.PRNGKey(0), n_chains, shard=False)
    assert states.geo_agg is not None and states.geo_agg.shape == (n_chains, 3, 3)

    stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(jnp.arange(n_chains))
    ones = jnp.ones(n_chains, jnp.float32)
    carry = rt.run_chunk(jax.random.split(jax.random.PRNGKey(1), n_chains),
                         states, stats, ones, ones, 120)
    state = carry.state

    # carried aggregates == fresh recompute (exact, not approximate)
    recomputed = jax.vmap(post.geo_agg_of)(state.clusters)
    np.testing.assert_allclose(np.asarray(state.geo_agg), np.asarray(recomputed),
                               rtol=1e-6, atol=1e-6)

    # carried geo prior part == full-recompute oracle
    geo_carried = jax.vmap(
        lambda cl, agg: post.geo_prior_from_agg(cl, agg).sum()
    )(state.clusters, state.geo_agg)
    geo_oracle = jax.vmap(lambda cl: post.geo_prior_per_cluster(cl).sum())(state.clusters)
    np.testing.assert_allclose(np.asarray(geo_carried), np.asarray(geo_oracle),
                               rtol=1e-5, atol=1e-5)

    from sbayes_tpu.sampling.state import PRIOR_GEO

    np.testing.assert_allclose(np.asarray(state.prior_parts[:, PRIOR_GEO]),
                               np.asarray(geo_oracle), rtol=1e-4, atol=1e-4)


def test_geo_agg_none_for_uniform_geo():
    rt = _runtime(geo_prior="uniform")
    states = rt.init_chains(jax.random.PRNGKey(0), 2, shard=False)
    assert states.geo_agg is None


def test_costs_per_object_matches_mst_recompute():
    """The proposal-weighting delta from the carried triple equals the
    recompute-based one (cost_based + mst skeleton path)."""
    rt = _runtime(aggregation="mean")
    from sbayes_tpu.model.posterior import Posterior

    post = Posterior(rt.consts, rt.sample_from_prior)
    state = jax.tree.map(lambda x: x[0], rt.init_chains(jax.random.PRNGKey(5), 2,
                                                        shard=False))
    with_agg = post.geo_prior_costs_per_object(state.clusters, 1,
                                               geo_agg=state.geo_agg)
    without = post.geo_prior_costs_per_object(state.clusters, 1)
    np.testing.assert_allclose(np.asarray(with_agg), np.asarray(without),
                               rtol=1e-5, atol=1e-6)
