"""Object-axis (data) sharding: the big-data scaling path.

For very large datasets the one-hot feature tensor and per-chain source
arrays dominate memory; they shard over an 'objects' mesh axis and GSPMD
partitions the count einsums (psum over object shards) automatically.
This validates that the posterior and a full MH step run correctly with
all object-axis arrays sharded — and match the unsharded results.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def sharded_setup():
    from sbayes_tpu.model.constants import build_model_constants
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    data = synthetic_data(n_objects=64, n_features=8, n_states=4, n_families=2, seed=9)
    config = synthetic_config(n_clusters=2, geo_prior="uniform")
    model = Model(data, config.model)

    mesh = Mesh(np.asarray(jax.devices()), ("objects",))
    return model, config, mesh


def _shard_consts(consts, mesh):
    """Place the object-axis arrays of ModelConstants across the mesh."""
    import dataclasses

    on_objects = NamedSharding(mesh, P("objects"))
    groups_sh = NamedSharding(mesh, P(None, None, "objects"))
    return dataclasses.replace(
        consts,
        features=jax.device_put(jnp.asarray(consts.features), on_objects),
        na=jax.device_put(jnp.asarray(consts.na), on_objects),
        groups=jax.device_put(jnp.asarray(consts.groups), groups_sh),
        hc_conf=jax.device_put(jnp.asarray(consts.hc_conf), on_objects),
    )


def test_sharded_posterior_matches(sharded_setup):
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample

    model, config, mesh = sharded_setup
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    state = generate_prior_sample(jax.random.PRNGKey(2), cond)

    want = jax.jit(cond.post.parts)(state)

    consts_sh = _shard_consts(model.consts, mesh)
    post_sh = Posterior(consts_sh)
    state_sh = state._replace(
        clusters=jax.device_put(state.clusters, NamedSharding(mesh, P(None, "objects"))),
        source=jax.device_put(state.source, NamedSharding(mesh, P("objects"))),
    )
    got = jax.jit(post_sh.parts)(state_sh)

    np.testing.assert_allclose(float(got.log_lh), float(want.log_lh), rtol=1e-5)
    np.testing.assert_allclose(float(got.source_prior), float(want.source_prior), rtol=1e-5)


def test_sharded_mh_step_runs(sharded_setup):
    """A full MH step executes with object-sharded constants and state."""
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.kernel import make_mh_apply_fn
    from sbayes_tpu.sampling.operators import get_operator_schedule
    from sbayes_tpu.sampling.prior_sampling import generate_prior_sample

    model, config, mesh = sharded_setup
    consts_sh = _shard_consts(model.consts, mesh)
    cond = Conditionals(Posterior(consts_sh), 1.0, 1.0)
    state = generate_prior_sample(jax.random.PRNGKey(2), cond)
    state = jax.jit(cond.post.fill_state)(state)
    state = state._replace(
        clusters=jax.device_put(state.clusters, NamedSharding(mesh, P(None, "objects"))),
        source=jax.device_put(state.source, NamedSharding(mesh, P("objects"))),
    )

    ops = get_operator_schedule(cond, config.mcmc.operators)
    apply = jax.jit(make_mh_apply_fn(cond, ops))
    for i in range(len(ops)):
        state, accept, _ss, nf = apply(jnp.int32(i), jax.random.PRNGKey(50 + i), state)
        assert int(nf) == 0
    assert np.isfinite(float(state.log_lh))
