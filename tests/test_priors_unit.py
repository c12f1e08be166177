"""Unit tests for prior variants not exercised by the e2e configs."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp



pytestmark = pytest.mark.smoke

@pytest.fixture(scope="module")
def base():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=20, n_features=5, n_states=3, n_families=2, seed=2)
    config = synthetic_config(n_clusters=2, geo_prior="uniform")
    model = Model(data, config.model)
    cond = Conditionals(model.posterior)
    state = generate_prior_sample(jax.random.PRNGKey(1), cond)
    return model, state


def _posterior_with(consts, **geo_overrides):
    from sbayes_tpu.model.constants import GeoPriorConstants
    from sbayes_tpu.model.posterior import Posterior

    geo = dataclasses.replace(consts.geo, **geo_overrides)
    return Posterior(dataclasses.replace(consts, geo=geo))


def test_size_prior_variants(base):
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.utils import log_multinom

    model, state = base
    c = model.consts
    sizes = np.asarray(state.clusters).sum(-1)

    post_us = Posterior(dataclasses.replace(c, size_prior_type="uniform_size"))
    got = float(jax.jit(post_us.size_prior)(state.clusters))
    want = -log_multinom(c.N, sizes.astype(int))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    post_q = Posterior(dataclasses.replace(c, size_prior_type="quadratic"))
    got_q = float(jax.jit(post_q.size_prior)(state.clusters))
    np.testing.assert_allclose(got_q, -np.sum(np.log(sizes.astype(float) ** 2)), rtol=1e-5)


def test_geo_prior_sigmoid(base):
    from scipy.special import log_expit
    from scipy.sparse.csgraph import minimum_spanning_tree

    model, state = base
    c = model.consts
    post = _posterior_with(
        c, prior_type="cost_based", probability_function="sigmoid",
        scale=2e5, inflection_point=1e5, aggregation="sum", skeleton="mst",
    )
    got = np.asarray(jax.jit(post.geo_prior_per_cluster)(state.clusters))

    cost = np.asarray(c.cost_matrix, float)
    want = []
    for k in range(c.K):
        mask = np.asarray(state.clusters[k])
        sub = cost[np.ix_(mask, mask)]
        mst = minimum_spanning_tree(sub)
        agg = float(np.asarray(mst.tocsr()[mst.nonzero()]).sum()) if mask.sum() > 1 else 0.0
        want.append(log_expit(-(agg - 1e5) / 2e5) - log_expit(1e5 / 2e5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_geo_prior_simulated(base):
    """Simulated geo prior: fitted logistic of scaled MST total distance."""
    from scipy.special import log_expit
    from scipy.sparse.csgraph import minimum_spanning_tree

    model, state = base
    c = model.consts
    mean_edge = 123456.0
    post = _posterior_with(c, prior_type="simulated", mean_edge_length=mean_edge)
    got = np.asarray(jax.jit(post.geo_prior_per_cluster)(state.clusters))

    def intercept(n):
        a, b, cc, d = -1.62973132061948, 12.7679075267602, -25.4137798184766, 17.237407405487
        ln = np.log(n)
        return a * ln**3 + b * ln**2 + cc * ln + d

    def coeff(n):
        a, b, cc, d = -31.397363895626, 1.02000702311327, -94.0788824218419, 0.93626444975598
        return a * b ** (-n) + cc / n + d

    cost = np.asarray(c.cost_matrix, float) * 0.020838 / mean_edge
    want = []
    for k in range(c.K):
        mask = np.asarray(state.clusters[k])
        n = int(mask.sum())
        sub = cost[np.ix_(mask, mask)]
        mst = minimum_spanning_tree(sub)
        total = float(np.asarray(mst.tocsr()[mst.nonzero()]).sum()) if n > 1 else 0.0
        want.append(log_expit(coeff(n) * total + intercept(n)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_geo_prior_complete_graph_skeleton(base):
    model, state = base
    c = model.consts
    post = _posterior_with(
        c, prior_type="cost_based", probability_function="exponential",
        scale=1e6, aggregation="mean", skeleton="complete_graph",
    )
    got = np.asarray(jax.jit(post.geo_prior_per_cluster)(state.clusters))

    cost = np.asarray(c.cost_matrix, float)
    want = []
    for k in range(c.K):
        mask = np.asarray(state.clusters[k])
        sub = cost[np.ix_(mask, mask)]
        want.append(-sub.mean() / 1e6)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_geo_prior_delaunay_skeleton(base):
    """skeleton=delaunay recomputes the per-cluster Delaunay graph
    (reference prior.py:807-821) — validated against a direct scipy
    computation on the cluster's points."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from scipy.spatial import Delaunay

    model, state = base
    post = _posterior_with(model.consts, prior_type="cost_based",
                           probability_function="exponential",
                           aggregation="sum", skeleton="delaunay", scale=1e5)
    vals = jax.jit(post.geo_prior_per_cluster)(state.clusters)

    locs = np.asarray(model.consts.locations)
    cost = np.asarray(model.consts.cost_matrix)
    for k in range(state.clusters.shape[0]):
        mask = np.asarray(state.clusters[k])
        idx = np.flatnonzero(mask)
        tri = Delaunay(locs[idx])
        edges = set()
        for simplex in tri.simplices:
            for a in range(3):
                for b in range(a + 1, 3):
                    edges.add(tuple(sorted((simplex[a], simplex[b]))))
        total = sum(cost[idx[a], idx[b]] for a, b in edges)
        np.testing.assert_allclose(float(vals[k]), -total / 1e5, rtol=1e-5)
