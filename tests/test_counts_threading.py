"""OpResult.counts invariant: every operator that threads candidate counts
to the MH kernel must thread EXACTLY the counts of its candidate state.

The cluster operators compute them as O(F·S) delta updates
(OperatorFactory._delta_counts) instead of the full O(N·F·S) einsum; the
counts are integer-valued f32, so equality is exact — any mismatch means a
wrong candidate log-likelihood in the MH ratio.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.operators import get_operator_schedule
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=24, n_features=6, n_states=4, n_families=2, seed=7)
    config = synthetic_config(n_clusters=2, geo_prior="cost_based", rate=1e6)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ops = get_operator_schedule(cond, config.mcmc.operators)
    state = jax.jit(lambda k: generate_prior_sample(k, cond))(jax.random.PRNGKey(8))
    return cond, ops, state


def test_op_result_counts_match_full_recompute(setup):
    cond, ops, state = setup
    for spec in ops:
        for seed in range(4):
            res = jax.jit(spec.fn)(jax.random.PRNGKey(100 + seed), state)
            if res.counts is None:
                continue
            cl, conf = jax.jit(cond.post.feature_counts)(
                res.state.clusters, res.state.source
            )
            np.testing.assert_array_equal(
                np.asarray(res.counts[0]), np.asarray(cl),
                err_msg=f"{spec.name} seed {seed}: cluster counts diverge",
            )
            np.testing.assert_array_equal(
                np.asarray(res.counts[1]), np.asarray(conf),
                err_msg=f"{spec.name} seed {seed}: confounder counts diverge",
            )


def test_counts_threading_ops_cover_hot_branches(setup):
    """The cluster family and source ops must actually thread counts
    (a silent None would quietly reintroduce the kernel recompute)."""
    cond, ops, state = setup
    threading = {}
    for spec in ops:
        res = jax.jit(spec.fn)(jax.random.PRNGKey(3), state)
        threading[spec.name] = res.counts is not None
    for name in ("cluster_gibbsish_geo", "cluster_jump_gibbsish",
                 "gibbsish_sample_cluster_wide_geo", "gibbs_sample_sources"):
        assert threading[name], f"{name} does not thread candidate counts"
