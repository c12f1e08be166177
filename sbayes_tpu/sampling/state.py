"""The MCMC chain state: a flat PyTree.

This replaces the reference's versioned copy-on-write ``Sample`` +
``ModelCache`` dependency DAG (sbayes/sampling/state.py, 639 LoC) with a
plain immutable NamedTuple. There is no cache: the posterior is fully
recomputed each step (one fused kernel), so functional updates are free and
no coherence machinery is needed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sbayes_tpu.model.constants import ModelConstants


PRIOR_SIZE, PRIOR_GEO, PRIOR_WEIGHTS, PRIOR_SOURCE = 0, 1, 2, 3
"""Indices into ChainState.prior_parts."""


class ChainState(NamedTuple):
    """State of one MCMC chain. All leaves are arrays (vmappable).

    ``prior_parts`` caches the prior decomposition (size, geo, weights,
    source) so operator branches can statically recompute only the terms
    they can change — the compile-time analogue of the reference's cache
    DAG, with ``log_prior == prior_parts.sum()`` as the invariant.
    """

    clusters: jnp.ndarray     # bool (K, N) cluster memberships
    weights: jnp.ndarray      # f32 (F, C) mixture weights per feature
    # Component attribution: bool one-hot (N, F, C) — or, when
    # ModelConstants.source_packed, the packed int8 (N, F) index form
    # (sentinel C = NA): C x less memory/traffic for the largest leaf.
    # model/math.py's source_* helpers are polymorphic on the two forms.
    source: jnp.ndarray       # bool (N, F, C) | int8 (N, F)
    log_lh: jnp.ndarray       # f32 () current log-likelihood (unheated)
    log_prior: jnp.ndarray    # f32 () current log-prior (unheated)
    prior_parts: jnp.ndarray  # f32 (4,) [size, geo, weights, source] log-priors
    # Sufficient-statistic counts of (clusters, source) carried as part of
    # the Markov-chain state: cl_counts (K,F,S) and conf_counts
    # (C-1,Gmax,F,S). Operators maintain them with EXACT integer-valued f32
    # delta updates (or tile-fused recomputes for multi-object moves), so
    # per-step kernels never re-stream the (N,F,S) feature tensor just to
    # rebuild counts. ``None`` only on freshly built states before
    # ``Posterior.fill_state`` — every sampling path fills them first.
    cl_counts: jnp.ndarray = None    # f32 (K, F, S)
    conf_counts: jnp.ndarray = None  # f32 (C-1, Gmax, F, S)
    # Carried per-cluster geo-skeleton aggregates (K, 3) = [total edge
    # cost, n_edges, max_edge] — a pure function of ``clusters`` that
    # operators re-derive only for the cluster(s) they change (one
    # masked-Prim MST per step instead of K+2; the reference caches the
    # analogous per-cluster geo prior, prior.py:769-805). ``None`` when
    # the geo prior is uniform or before ``Posterior.fill_state``.
    geo_agg: jnp.ndarray = None      # f32 (K, 3)
    # Carried availability-pattern source counts (P, F, C) — the sufficient
    # statistic of the weights likelihood (gibbs_sample_weights prices both
    # the old and proposed weights from it without streaming the (N, F, C)
    # source tensor). Exact integer-valued f32, delta-updated from the same
    # row deltas every source/cluster-touching operator already computes;
    # pattern ids per ModelConstants.static_pat/pat_bits. ``None`` only
    # before ``Posterior.fill_state``.
    pat_counts: jnp.ndarray = None   # f32 (P, F, C)

    @property
    def n_clusters(self):
        return self.clusters.shape[-2]

    @property
    def n_objects(self):
        return self.clusters.shape[-1]

    @property
    def n_features(self):
        return self.weights.shape[-2]

    @property
    def n_components(self):
        return self.weights.shape[-1]

    def to_numpy(self) -> dict:
        d = {
            "clusters": np.asarray(self.clusters),
            "weights": np.asarray(self.weights),
            "source": np.asarray(self.source),
            "log_lh": float(self.log_lh),
            "log_prior": float(self.log_prior),
            "prior_parts": np.asarray(self.prior_parts),
        }
        if self.cl_counts is not None:
            d["cl_counts"] = np.asarray(self.cl_counts)
            d["conf_counts"] = np.asarray(self.conf_counts)
        if self.geo_agg is not None:
            d["geo_agg"] = np.asarray(self.geo_agg)
        if self.pat_counts is not None:
            d["pat_counts"] = np.asarray(self.pat_counts)
        return d

    @classmethod
    def from_numpy(cls, d: dict) -> "ChainState":
        """Rebuild from a checkpoint dict. Counts absent from legacy
        checkpoints stay ``None``; callers refresh via fill_state."""
        return cls(
            clusters=jnp.asarray(d["clusters"], dtype=bool),
            weights=jnp.asarray(d["weights"], dtype=jnp.float32),
            source=jnp.asarray(
                d["source"],
                dtype=(jnp.int8 if np.asarray(d["source"]).dtype == np.int8
                       else bool)),
            log_lh=jnp.asarray(d.get("log_lh", -np.inf), dtype=jnp.float32),
            log_prior=jnp.asarray(d.get("log_prior", -np.inf), dtype=jnp.float32),
            prior_parts=jnp.asarray(
                d.get("prior_parts", np.full(4, -np.inf)), dtype=jnp.float32
            ),
            cl_counts=(jnp.asarray(d["cl_counts"], jnp.float32)
                       if "cl_counts" in d else None),
            conf_counts=(jnp.asarray(d["conf_counts"], jnp.float32)
                         if "conf_counts" in d else None),
            geo_agg=(jnp.asarray(d["geo_agg"], jnp.float32)
                     if "geo_agg" in d else None),
            pat_counts=(jnp.asarray(d["pat_counts"], jnp.float32)
                        if "pat_counts" in d else None),
        )


def empty_state(consts: ModelConstants) -> ChainState:
    """An all-empty state with the right shapes (placeholder values)."""
    if getattr(consts, "source_packed", False):
        source = jnp.full((consts.N, consts.F), consts.C, dtype=jnp.int8)
    else:
        source = jnp.zeros((consts.N, consts.F, consts.C), dtype=bool)
    return ChainState(
        clusters=jnp.zeros((consts.K, consts.N), dtype=bool),
        weights=jnp.full((consts.F, consts.C), 1.0 / consts.C, dtype=jnp.float32),
        source=source,
        log_lh=jnp.asarray(-jnp.inf, dtype=jnp.float32),
        log_prior=jnp.asarray(-jnp.inf, dtype=jnp.float32),
        prior_parts=jnp.full((4,), -jnp.inf, dtype=jnp.float32),
    )
