"""Packed int8 source-state layout (ModelConstants.source_packed).

The packed (N, F) int8 index form with sentinel C must be BEHAVIORALLY
IDENTICAL to the bool one-hot (N, F, C) form: all source math flows
through the polymorphic helpers (model/math.py), every probability/count
they produce picks the same float values, so whole sampling trajectories
agree bitwise. Reference semantics anchor: sbayes/sampling/state.py:501
(source tensor), sampling/operators.py:423-579 (source resampling).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbayes_tpu.model.math import (
    gather_rows,
    pack_source,
    scatter_rows,
    source_comp,
    source_n_changed,
    source_onehot,
    source_pick,
)

pytestmark = pytest.mark.smoke


def _random_source(key, n, f, c, p_na=0.2):
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n, f), 0, c)
    oh = jax.nn.one_hot(idx, c, dtype=bool)
    na = jax.random.uniform(k2, (n, f)) < p_na
    return oh & ~na[:, :, None]


def test_pack_unpack_roundtrip():
    src = _random_source(jax.random.PRNGKey(0), 17, 9, 4)
    packed = pack_source(src)
    assert packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(source_onehot(packed, 4)),
                                  np.asarray(src))
    # NA rows (all-zero) map to the sentinel C
    np.testing.assert_array_equal(np.asarray(packed == 4),
                                  ~np.asarray(src.any(-1)))


def test_source_comp_and_pick_match_bool_form():
    key = jax.random.PRNGKey(1)
    src = _random_source(key, 23, 7, 5)
    packed = pack_source(src)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(source_comp(packed, i)),
                                      np.asarray(src[:, :, i]))
    p = jax.random.uniform(jax.random.PRNGKey(2), (23, 7, 5))
    # identical float values (take_along_axis picks the same element the
    # masked sum isolates)
    np.testing.assert_array_equal(np.asarray(source_pick(p, packed)),
                                  np.asarray((p * src).sum(-1)))


def test_gather_scatter_rows_packed_match_bool():
    key = jax.random.PRNGKey(3)
    n, f, c, m = 31, 6, 4, 5
    src = _random_source(key, n, f, c)
    packed = pack_source(src)
    idx = jnp.asarray([0, 7, 30, n, n])  # padded entries = N
    rows_b = gather_rows(src, idx)
    rows_p = gather_rows(packed, idx, c)
    np.testing.assert_array_equal(np.asarray(rows_p), np.asarray(rows_b))
    assert not np.asarray(rows_p[3:]).any()  # padded -> all-zero rows

    new_rows = _random_source(jax.random.PRNGKey(4), m, f, c)
    out_b = scatter_rows(src, idx, new_rows)
    out_p = scatter_rows(packed, idx, new_rows)
    np.testing.assert_array_equal(np.asarray(source_onehot(out_p, c)),
                                  np.asarray(out_b))


def test_source_n_changed_matches_xor():
    # Both states share the NA mask (a property of the data, not the
    # state), so every differing cell flips exactly two one-hot bits.
    na = jax.random.uniform(jax.random.PRNGKey(7), (19, 8)) < 0.2
    a = _random_source(jax.random.PRNGKey(5), 19, 8, 3, p_na=0.0) & ~na[:, :, None]
    b = _random_source(jax.random.PRNGKey(6), 19, 8, 3, p_na=0.0) & ~na[:, :, None]
    got = float(source_n_changed(pack_source(a), pack_source(b)))
    want = float((np.asarray(a) ^ np.asarray(b)).sum())
    assert got == want
    assert float(source_n_changed(a, b)) == want


def _build_runtime(monkeypatch, dtype_env):
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.sampling.runner import SamplerRuntime
    from sbayes_tpu.testing import synthetic_config, synthetic_data

    monkeypatch.setenv("SBAYES_TPU_SOURCE_DTYPE", dtype_env)
    data = synthetic_data(n_objects=30, n_features=12, n_states=3,
                          n_families=2, seed=7)
    config = synthetic_config(n_clusters=2, geo_prior="uniform")
    model = Model(data, config.model)
    return SamplerRuntime(model, config.mcmc, sample_from_prior=False)


def test_packed_trajectory_matches_bool(monkeypatch):
    """Same keys, same model: the packed and bool layouts must produce the
    SAME sampling trajectory (every probability/count picks identical
    floats, so accept decisions agree bitwise)."""
    from sbayes_tpu.sampling.kernel import OperatorStats

    n_chains, n_steps = 3, 60
    results = {}
    for env in ("bool", "idx"):
        rt = _build_runtime(monkeypatch, env)
        assert rt.consts.source_packed == (env == "idx")
        states = rt.init_chains(jax.random.PRNGKey(0), n_chains, shard=False)
        if env == "idx":
            assert states.source.dtype == jnp.int8 and states.source.ndim == 3
        stats = jax.vmap(lambda _: OperatorStats.zeros(rt.n_ops))(
            jnp.arange(n_chains))
        ones = jnp.ones(n_chains, jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
        carry = rt.run_chunk(keys, states, stats, ones, ones, n_steps)
        results[env] = (np.asarray(carry.state.log_lh),
                        np.asarray(carry.state.log_prior),
                        np.asarray(carry.stats.accepts),
                        np.asarray(source_onehot(carry.state.source,
                                                 rt.consts.C)))

    for a, b in zip(results["bool"], results["idx"]):
        np.testing.assert_array_equal(a, b)


def test_packed_fill_state_invariants(monkeypatch):
    """fill_state computes identical carried invariants from both forms."""
    rt_b = _build_runtime(monkeypatch, "bool")
    rt_p = _build_runtime(monkeypatch, "idx")
    states_b = rt_b.init_chains(jax.random.PRNGKey(2), 2, shard=False)
    states_p = rt_p.init_chains(jax.random.PRNGKey(2), 2, shard=False)
    for name in ("log_lh", "log_prior", "prior_parts", "cl_counts",
                 "conf_counts", "pat_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(states_b, name)),
            np.asarray(getattr(states_p, name)), err_msg=name)


def test_packed_resume_from_bool_checkpoint(monkeypatch, tmp_path):
    """A bool-form checkpoint resumes into a packed-source runtime (and
    the reverse) via the conversion in runner._load_state_pickle."""
    import pickle

    rt_b = _build_runtime(monkeypatch, "bool")
    state_b = jax.tree.map(lambda x: x[0],
                           rt_b.init_chains(jax.random.PRNGKey(3), 1,
                                            shard=False))
    d = state_b.to_numpy()
    d["i_step"] = 40
    path = tmp_path / "state.pickle"
    with open(path, "wb") as f:
        pickle.dump(d, f)

    rt_p = _build_runtime(monkeypatch, "idx")

    # Minimal stand-in for MCMCSetup._load_state_pickle's conversion logic
    from sbayes_tpu.model.math import source_is_packed
    from sbayes_tpu.sampling.state import ChainState

    with open(path, "rb") as f:
        d2 = pickle.load(f)
    state = ChainState.from_numpy(d2)
    assert not source_is_packed(state.source)
    state = state._replace(source=pack_source(state.source))
    filled = jax.jit(
        lambda s: __import__("sbayes_tpu.model.posterior", fromlist=["Posterior"])
        .Posterior(rt_p.consts).fill_state(s))(state)
    np.testing.assert_allclose(float(filled.log_lh), float(state_b.log_lh),
                               rtol=1e-6)
