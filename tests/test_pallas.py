"""The fused Pallas likelihood kernel matches the XLA einsum path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def model():
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=30, n_features=8, n_states=4, n_families=3, seed=5)
    config = synthetic_config(n_clusters=2, geo_prior="uniform")
    return Model(data, config.model)


def test_pallas_loglh_matches_xla(model):
    from sbayes_tpu.ops.pallas_kernels import fits_in_vmem, make_pallas_log_likelihood
    from sbayes_tpu.sampling.prior_sampling import generate_prior_samples
    from sbayes_tpu.sampling.conditionals import Conditionals

    c = model.consts
    assert fits_in_vmem(c.K, c.N, c.F, c.S, c.C, c.Gmax)

    cond = Conditionals(model.posterior)
    B = 6
    states = generate_prior_samples(jax.random.PRNGKey(3), cond, B)

    # XLA reference path (per chain)
    want = np.asarray(
        jax.vmap(lambda cl, src: model.posterior.log_likelihood_from_counts(
            *model.posterior.feature_counts(cl, src)
        ))(states.clusters, states.source)
    )

    # Pallas (interpreter mode on CPU)
    log_lh = make_pallas_log_likelihood(c, interpret=True)
    got = np.asarray(log_lh(states.clusters, states.source))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
