"""Jittable minimum-spanning-tree edge costs via masked Prim's algorithm.

The geo-prior aggregates edge costs along the MST of the cost submatrix of a
cluster (reference: sbayes/model/prior.py:950-962 ``compute_mst_distances``
using scipy.sparse.csgraph). scipy's MST is not jittable; inside ``jit`` we
run a fixed-iteration Prim's algorithm with inf-masking over the full
(N, N) cost matrix and a boolean cluster mask — O(N^2) per cluster, which is
cheap for realistic cluster sizes and fully fuses into the step kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BIG = jnp.inf


def cluster_mst_edge_costs(cost, mask):
    """Edge costs of the MST over the masked subgraph of a dense cost matrix.

    Args:
        cost: (N, N) symmetric cost matrix (finite entries).
        mask: (N,) boolean cluster membership.
    Returns:
        (N-1,) array whose first (m-1) nonpad entries are the MST edge costs
        of the m masked nodes; remaining entries are 0. A cluster of size
        <= 1 yields all zeros (matching the reference's fallback).
    """
    n = cost.shape[0]
    dtype = cost.dtype

    start = jnp.argmax(mask)  # first member (mask must have >= 1 True for meaningful output)
    cand0 = mask & (jnp.arange(n) != start)
    d0 = jnp.where(cand0, cost[start], BIG)
    # A cluster of m members needs exactly m-1 Prim iterations; iterating
    # to the while-condition (instead of a fixed n-1 fori) exits as soon
    # as the tree is complete — under vmap, at the batch-max cluster
    # size. Typical clusters are far smaller than N, so this cuts the
    # kernel's sequential depth (its entire cost on TPU) proportionally.
    m_edges = jnp.maximum(mask.sum().astype(jnp.int32) - 1, 0)

    def cond_fn(carry):
        _, _, _, count, i = carry
        return (i < n - 1) & (count < m_edges)

    def body(carry):
        cand, d, edges, count, i = carry
        dm = jnp.where(cand, d, BIG)
        j = jnp.argmin(dm)
        w = dm[j]
        valid = jnp.isfinite(w)
        edges = edges.at[i].set(jnp.where(valid, w, 0.0).astype(dtype))
        count = count + valid.astype(jnp.int32)
        # Remove j from candidates and relax distances through j.
        cand = cand & (jnp.arange(n) != j) & jnp.full((n,), valid)
        d = jnp.where(cand, jnp.minimum(d, cost[j]), d)
        return cand, d, edges, count, i + 1

    _, _, edges, count, _ = lax.while_loop(
        cond_fn, body,
        (cand0, d0, jnp.zeros(n - 1, dtype), jnp.int32(0), jnp.int32(0)),
    )
    return edges, count


def mst_aggregate(cost, mask, aggregation: str):
    """Aggregate MST edge costs of a cluster: 'mean' | 'sum' | 'max'.

    Matches the reference aggregation semantics (prior.py:710-714, 793-794):
    a single-member (or empty) cluster aggregates to 0.
    """
    edges, count = cluster_mst_edge_costs(cost, mask)
    total = edges.sum()
    if aggregation == "sum":
        return total
    if aggregation == "mean":
        return total / jnp.maximum(count, 1).astype(cost.dtype)
    if aggregation == "max":
        return edges.max()
    raise ValueError(f"Unknown aggregation '{aggregation}'")
