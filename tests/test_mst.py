"""Masked Prim MST vs scipy's minimum_spanning_tree."""
import numpy as np
import jax.numpy as jnp
from scipy.sparse.csgraph import minimum_spanning_tree

from sbayes_tpu.ops.mst import cluster_mst_edge_costs, mst_aggregate


import pytest

pytestmark = pytest.mark.smoke

def scipy_mst_edges(cost, mask):
    sub = cost[np.ix_(mask, mask)]
    if sub.shape[0] <= 1:
        return np.zeros(0)
    mst = minimum_spanning_tree(sub)
    return np.asarray(mst.tocsr()[mst.nonzero()]).ravel()


def test_mst_total_matches_scipy(rng):
    for trial in range(10):
        n = 20
        pts = rng.random((n, 2))
        cost = np.linalg.norm(pts[:, None] - pts[None], axis=-1).astype(np.float32)
        mask = rng.random(n) < 0.5
        if mask.sum() == 0:
            mask[0] = True
        edges, count = cluster_mst_edge_costs(jnp.asarray(cost), jnp.asarray(mask))
        want = scipy_mst_edges(cost.astype(float), mask)
        assert int(count) == len(want)
        np.testing.assert_allclose(float(jnp.sum(edges)), want.sum(), rtol=1e-5)
        # max edge also matches
        if len(want):
            np.testing.assert_allclose(float(jnp.max(edges)), want.max(), rtol=1e-5)


def test_mst_singleton_and_empty():
    cost = jnp.asarray(np.random.default_rng(0).random((5, 5)), jnp.float32)
    edges, count = cluster_mst_edge_costs(cost, jnp.asarray([False, True, False, False, False]))
    assert float(jnp.sum(edges)) == 0.0 and int(count) == 0

    # aggregations of singleton cluster are all 0 (matching reference fallback)
    for agg in ("sum", "mean", "max"):
        assert float(mst_aggregate(cost, jnp.asarray([True, False, False, False, False]), agg)) == 0.0
