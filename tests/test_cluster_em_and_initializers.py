"""AlterClusterEM operator + legacy initializer modes (parity round 3).

AlterClusterEM (reference operators.py:1571-1665) is a non-scheduled
whole-cluster resampler whose proposal probabilities come from a short
annealed EM over cluster + confounder-group responsibilities; the MH
machinery is shared with the wide operator. The legacy initializers
(reference initializers.py:332-442) are selectable via
``mcmc.initialization.method``.
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy.stats import binomtest

import jax
import jax.numpy as jnp
from jax import lax

from sbayes_tpu.model.model import Model
from sbayes_tpu.model.posterior import Posterior
from sbayes_tpu.sampling.conditionals import Conditionals
from sbayes_tpu.sampling.operators import OperatorFactory, OperatorSpec
from sbayes_tpu.testing import synthetic_config, synthetic_data


def _build(n_objects=20, n_clusters=2, sample_from_prior=False, seed=3):
    data = synthetic_data(n_objects=n_objects, n_features=6, n_states=3,
                          n_families=2, seed=seed)
    config = synthetic_config(n_clusters=n_clusters)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts, sample_from_prior=sample_from_prior),
                        1.0, 1.0, sample_from_prior=sample_from_prior)
    return cond, config


def test_alter_cluster_em_proposes_and_accepts():
    """The EM-proposal wide operator runs, keeps the carried-count and
    geo invariants, and actually changes the state."""
    from sbayes_tpu.sampling.kernel import Carry, OperatorStats, make_step_fn

    cond, _ = _build()
    factory = OperatorFactory(cond)
    op = factory.make_alter_cluster_wide(consider_geo=False, em_proposal=True,
                                         n_em_steps=5)
    spec = OperatorSpec("alter_cluster_em", 1.0, op, "clusters")
    step = make_step_fn(cond, [spec])

    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample

    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(0))
    state = jax.jit(cond.post.fill_state)(state)

    def run(key, state):
        def body(c, _):
            return step(c), None

        carry, _ = lax.scan(body, Carry(key, state, OperatorStats.zeros(1)), length=40)
        return carry

    carry = jax.jit(run)(jax.random.PRNGKey(1), state)
    out = carry.state
    assert int(carry.stats.accepts[0]) > 0, "EM operator never accepted"
    assert int(carry.stats.non_finite) == 0

    # carried-count invariant
    cl, conf = cond.post.feature_counts(out.clusters, out.source)
    np.testing.assert_allclose(np.asarray(out.cl_counts), np.asarray(cl), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.conf_counts), np.asarray(conf), atol=1e-3)
    # posterior bookkeeping invariant
    parts = jax.jit(cond.post.parts)(out)
    np.testing.assert_allclose(float(out.log_lh), float(parts.log_lh), rtol=1e-4)
    np.testing.assert_allclose(float(out.log_prior), float(parts.log_prior), rtol=1e-4)


@pytest.mark.slow
def test_alter_cluster_em_preserves_prior():
    """Prior-invariance: 512 chains at exact prior samples, EM operator
    only, sample-from-prior mode — membership marginals must stay put
    (same harness as test_operator_balance.test_single_operator_preserves_prior)."""
    from sbayes_tpu.sampling.kernel import Carry, OperatorStats, make_step_fn
    from sbayes_tpu.sampling.prior_sampling import generate_prior_samples

    cond, _ = _build(sample_from_prior=True)
    factory = OperatorFactory(cond)
    op = factory.make_alter_cluster_wide(consider_geo=False, em_proposal=True,
                                         n_em_steps=3)
    spec = OperatorSpec("alter_cluster_em", 1.0, op, "clusters")
    step = make_step_fn(cond, [spec])

    n_chains, n_steps = 512, 60
    inits = generate_prior_samples(jax.random.PRNGKey(21), cond, n_chains)
    inits = jax.vmap(cond.post.fill_state)(inits)
    keys = jax.random.split(jax.random.PRNGKey(22), n_chains)

    def run_one(key, state):
        def body(c, _):
            return step(c), None

        carry, _ = lax.scan(body, Carry(key, state, OperatorStats.zeros(1)),
                            length=n_steps)
        return carry.state.clusters, carry.stats

    clusters, stats = jax.jit(jax.vmap(run_one))(keys, inits)
    clusters = np.asarray(clusters)
    accepts = int(np.asarray(stats.accepts).sum())
    assert accepts > n_chains, f"only {accepts} accepts — vacuous test"

    ref = generate_prior_samples(jax.random.PRNGKey(23), cond, 30_000)
    p_ref = np.asarray(ref.clusters).any(axis=1).mean(axis=0)
    in_any = clusters.any(axis=1)

    pvs = []
    for o in range(in_any.shape[1]):
        p = float(np.clip(p_ref[o], 1e-9, 1 - 1e-9))
        pvs.append(binomtest(k=int(in_any[:, o].sum()), n=n_chains, p=p).pvalue)
    pooled_dev = abs(in_any.mean() - p_ref.mean())
    n_low = sum(pv < 0.005 for pv in pvs)
    assert min(pvs) > 1e-4 and n_low <= 3 and pooled_dev < 0.02, (
        f"EM operator drifts off the prior (min_p={min(pvs):.2e}, "
        f"n_low={n_low}, pooled_dev={pooled_dev:.4f})"
    )


@pytest.mark.parametrize("method", ["seed_points", "random_growth"])
def test_legacy_initializer_modes(method):
    from sbayes_tpu.sampling.initializer import Initializer

    cond, _ = _build(n_objects=30)
    init = Initializer(cond, initial_size=5, attempts=2,
                       initial_cluster_steps=True, n_em_steps=5, method=method)
    state = jax.jit(init.generate_sample)(jax.random.PRNGKey(0))
    state = jax.jit(cond.post.fill_state)(state)

    clusters = np.asarray(state.clusters)
    assert clusters.shape == (2, 30)
    sizes = clusters.sum(-1)
    # ML steps enforce the size bounds afterwards
    assert (sizes >= cond.consts.min_size).all()
    assert (sizes <= cond.consts.max_size).all()
    # clusters stay disjoint
    assert clusters.sum(0).max() <= 1
    assert np.isfinite(float(state.log_lh))

    # source rows are valid one-hot (NA rows empty)
    src = np.asarray(state.source)
    na = np.asarray(cond.consts.na)
    assert (src.sum(-1) == (~na)).all()


def test_initial_cluster_shapes_only():
    """The raw legacy cluster generators produce disjoint boolean masks of
    the expected sizes (before refinement)."""
    from sbayes_tpu.sampling.initializer import Initializer

    cond, _ = _build(n_objects=30)
    init = Initializer(cond, initial_size=5, attempts=1, method="seed_points")

    seeds = jax.jit(init.generate_clusters_seed_points)(jax.random.PRNGKey(1))
    seeds = np.asarray(seeds)
    assert (seeds.sum(-1) == 1).all()
    assert seeds.sum(0).max() <= 1

    grown = jax.jit(init.generate_clusters_random_growth)(jax.random.PRNGKey(2))
    grown = np.asarray(grown)
    assert (grown.sum(-1) >= 1).all() and (grown.sum(-1) <= 5).all()
    assert grown.sum(0).max() <= 1
    # grown clusters are adjacency-connected
    adj = np.asarray(cond.consts.adjacency)
    for row in grown:
        idx = np.flatnonzero(row)
        if len(idx) < 2:
            continue
        reach = {idx[0]}
        frontier = {idx[0]}
        while frontier:
            nxt = {j for i in frontier for j in np.flatnonzero(adj[i]) if row[j]} - reach
            reach |= nxt
            frontier = nxt
        assert reach == set(idx), "random-growth cluster not connected"
