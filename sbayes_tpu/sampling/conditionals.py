"""Collapsed-conditional machinery shared by the Gibbs-flavored operators.

Pure JAX counterparts of reference sbayes/sampling/conditionals.py:
  * per-observation mixture-component likelihoods from posterior-mean
    effects (``likelihood_per_component``, ref:152-223),
  * leave-subset-out component likelihoods for source Gibbs resampling
    (``component_likelihood_given_unchanged``, ref: operators.py:863-928),
  * exact leave-self-out variant for unbiased likelihood logging
    (``likelihood_per_component_exact``, ref:300-367),
  * expected confounder features (ref: operators.py:1342-1379).

All functions are mask-based with static shapes: subsets are boolean
(N,)-masks, so the same compiled kernel serves any subset.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sbayes_tpu.model.constants import ModelConstants
from sbayes_tpu.model.math import (
    conditional_effect_mean,
    normalize,
    normalize_weights,
    sample_categorical_onehot,
)
from sbayes_tpu.model.posterior import Posterior

EPS32 = jnp.float32(1.1920929e-07)  # float32 machine epsilon


class SourceResample(NamedTuple):
    source: jnp.ndarray       # (N, F, C) new source array
    log_q: jnp.ndarray        # scalar forward log-probability
    log_q_back: jnp.ndarray   # scalar backward log-probability


class Conditionals:
    """Gibbs conditionals for a model at a given MC3 temperature."""

    def __init__(
        self,
        posterior: Posterior,
        temperature: float = 1.0,
        prior_temperature: float = 1.0,
        sample_from_prior: bool = False,
    ):
        self.post = posterior
        self.consts: ModelConstants = posterior.consts
        # Temperatures may be Python floats OR traced jax scalars: the whole
        # operator/kernel stack is built per-trace, so a vmapped per-chain
        # temperature ladder (MC3) compiles to ONE program.
        self.T = temperature
        self.Tp = prior_temperature
        self.sample_from_prior = sample_from_prior

    # ------------------------------------------------------------------
    # Component likelihoods
    # ------------------------------------------------------------------

    def likelihood_per_component(self, clusters, cl_counts, conf_counts):
        """(N, F, C) likelihood of each observation under each component.

        Effects are the posterior means normalize(counts + prior counts);
        objects outside all clusters get 0 in component 0; NA observations
        get likelihood 1 (reference: conditionals.py:152-223).
        """
        c = self.consts
        feats = jnp.asarray(c.features)
        cl_eff = normalize(cl_counts + jnp.asarray(c.conc_cluster)[None], axis=-1)
        lh0 = jnp.einsum("kn,kfs,nfs->nf", clusters.astype(feats.dtype), cl_eff, feats)

        conf_eff = normalize(conf_counts + jnp.asarray(c.conc_conf), axis=-1)
        lhc = jnp.einsum("cgn,cgfs,nfs->nfc", jnp.asarray(c.groups), conf_eff, feats)

        lh = jnp.concatenate([lh0[:, :, None], lhc], axis=-1)
        return jnp.where(jnp.asarray(c.na)[:, :, None], 1.0, lh)

    def component_likelihood_given_unchanged(self, clusters, source, subset, i_cluster,
                                             conf_counts_full=None):
        """(N, F, C) heated component likelihoods with the subset's own
        contribution removed from the effect estimates.

        Mirrors reference operators.py:863-928: the cluster effect uses
        counts of cluster members outside ``subset``; each confounder
        effect uses its full counts minus the subset's contribution.
        Only rows in ``subset`` are meaningful to the caller.
        """
        c = self.consts
        feats = jnp.asarray(c.features)
        dtype = feats.dtype
        sub = subset.astype(dtype)

        # Cluster component: counts from (cluster & ~subset) rows.
        cluster = clusters[i_cluster]
        keep = cluster.astype(dtype) * (1.0 - sub)
        src0 = source[:, :, 0].astype(dtype)
        cl_counts_keep = jnp.einsum("n,nf,nfs->fs", keep, src0, feats)
        cluster_effect = conditional_effect_mean(
            prior_counts=jnp.asarray(c.conc_cluster),
            feature_counts=cl_counts_keep,
            unif_counts=jnp.asarray(c.unif_conc),
            prior_temperature=self.Tp,
            temperature=self.T,
        )
        lh0 = jnp.einsum("fs,nfs->nf", cluster_effect, feats)

        # Confounder components: full counts minus subset contribution.
        # ``conf_counts_full`` (counts of `source` over the static groups)
        # can be passed in to reuse the step's forward count computation.
        srcc = source[:, :, 1:].astype(dtype)
        groups = jnp.asarray(c.groups)
        changeable = jnp.einsum("cgn,n,nfc,nfs->cgfs", groups, sub, srcc, feats)
        if conf_counts_full is None:
            conf_counts_full = jnp.einsum("cgn,nfc,nfs->cgfs", groups, srcc, feats)
        unchangeable = conf_counts_full - changeable
        conf_effect = conditional_effect_mean(
            prior_counts=jnp.asarray(c.conc_conf),
            feature_counts=unchangeable,
            unif_counts=jnp.asarray(c.unif_conc)[None, None],
            prior_temperature=self.Tp,
            temperature=self.T,
        )
        lhc = jnp.einsum("cgn,cgfs,nfs->nfc", groups, conf_effect, feats)

        lh = jnp.concatenate([lh0[:, :, None], lhc], axis=-1)
        lh = jnp.where(jnp.asarray(c.na)[:, :, None], 1.0, lh)
        return lh ** (1.0 / self.T)

    def likelihood_per_component_exact(self, clusters, source):
        """Exact leave-self-out component likelihoods (for lh logging).

        Each observation is scored under effects estimated WITHOUT its own
        contribution (reference: conditionals.py:300-367). Returns (N,F,C).
        """
        c = self.consts
        feats = jnp.asarray(c.features)
        dtype = feats.dtype
        cl_counts, conf_counts = self.post.feature_counts(clusters, source)

        # Cluster component: for object o in cluster k, effect is
        # normalize(counts[k] + conc - own contribution).
        own0 = feats * source[:, :, 0][:, :, None].astype(dtype)  # (N,F,S)
        base_cl = cl_counts + jnp.asarray(c.conc_cluster)[None]   # (K,F,S)
        per_obj_cl = jnp.einsum("kn,kfs->nfs", clusters.astype(dtype), base_cl) - (
            jnp.any(clusters, axis=0)[:, None, None] * own0
        )
        member = jnp.any(clusters, axis=0)
        eff0 = per_obj_cl / jnp.maximum(per_obj_cl.sum(-1, keepdims=True), EPS32)
        lh0 = jnp.where(member[:, None], jnp.einsum("nfs,nfs->nf", eff0, feats), 0.0)

        # Confounder components
        groups = jnp.asarray(c.groups)  # (Cm1, Gmax, N)
        base_conf = conf_counts + jnp.asarray(c.conc_conf)  # (Cm1,Gmax,F,S)
        lhs = [lh0[:, :, None]]
        for i_c in range(groups.shape[0]):
            own = feats * source[:, :, 1 + i_c][:, :, None].astype(dtype)
            per_obj = jnp.einsum("gn,gfs->nfs", groups[i_c], base_conf[i_c]) - (
                (groups[i_c].sum(0) > 0)[:, None, None] * own
            )
            in_group = groups[i_c].sum(0) > 0
            eff = per_obj / jnp.maximum(per_obj.sum(-1, keepdims=True), EPS32)
            lh_c = jnp.where(in_group[:, None], jnp.einsum("nfs,nfs->nf", eff, feats), 0.0)
            lhs.append(lh_c[:, :, None])

        lh = jnp.concatenate(lhs, axis=-1)
        return jnp.where(jnp.asarray(c.na)[:, :, None], 1.0, lh)

    def expected_confounder_features(self, clusters, weights, conf_counts):
        """(N, F, S) expected feature values under the confounder mixture.

        Reference: operators.py:1342-1379 (heated posterior-mean confounder
        effects, weighted by per-object heated normalized weights).
        """
        c = self.consts
        w = normalize_weights(weights, self.post.has_components(clusters))
        w_heated = normalize(w ** (1.0 / self.Tp), axis=-1)
        p_conf = conditional_effect_mean(
            prior_counts=jnp.asarray(c.conc_conf),
            feature_counts=conf_counts,
            unif_counts=jnp.asarray(c.unif_conc)[None, None],
            prior_temperature=self.Tp,
            temperature=self.T,
        )
        return jnp.einsum(
            "cgn,cgfs,nfc->nfs", jnp.asarray(c.groups), p_conf, w_heated[:, :, 1:]
        )

    # ------------------------------------------------------------------
    # Source resampling
    # ------------------------------------------------------------------

    def _masked_source_logp(self, p, source, subset):
        """Sum of log p at the one-hot source entries over (subset, valid)."""
        c = self.consts
        valid = (~jnp.asarray(c.na)) & subset[:, None]
        chosen = (p * source).sum(-1)
        return jnp.where(valid, jnp.log(jnp.maximum(chosen, 1e-35)), 0.0).sum()

    def gibbs_resample_source(self, key, state_old, clusters_new, subset, i_cluster,
                              conf_counts_full=None) -> SourceResample:
        """Resample ``source`` rows in ``subset`` from their collapsed
        conditional, leaving out the subset's own contribution.

        Mirrors reference ClusterOperator.gibbs_sample_source
        (operators.py:796-849). Uses the NEW clusters for the forward
        proposal weights and the OLD clusters for the backward ones.
        """
        c = self.consts
        na = jnp.asarray(c.na)

        lh_pc = self.component_likelihood_given_unchanged(
            clusters_new, state_old.source, subset, i_cluster,
            conf_counts_full=conf_counts_full,
        )

        w_new = normalize_weights(state_old.weights, self.post.has_components(clusters_new))
        w_new = w_new ** (1.0 / self.Tp)
        if self.sample_from_prior:
            p = w_new / jnp.maximum(w_new.sum(-1, keepdims=True), EPS32)
        else:
            p = normalize(w_new * lh_pc, axis=-1)

        x = sample_categorical_onehot(key, p)
        x = x & ~na[:, :, None]
        source_new = jnp.where(subset[:, None, None], x, state_old.source)

        log_q = self._masked_source_logp(p, source_new, subset)

        w_old = normalize_weights(state_old.weights, self.post.has_components(state_old.clusters))
        w_old = w_old ** (1.0 / self.Tp)
        if self.sample_from_prior:
            p_back = w_old / jnp.maximum(w_old.sum(-1, keepdims=True), EPS32)
        else:
            p_back = normalize(w_old * lh_pc, axis=-1)
        log_q_back = self._masked_source_logp(p_back, state_old.source, subset)

        return SourceResample(source=source_new, log_q=log_q, log_q_back=log_q_back)

    def source_posterior(self, clusters, weights, source):
        """(N, F, C) posterior over component attributions given everything
        else (reference: GibbsSampleSource.calculate_source_posterior,
        operators.py:554-574)."""
        cl_counts, conf_counts = self.post.feature_counts(clusters, source)
        lh_pc = self.likelihood_per_component(clusters, cl_counts, conf_counts)
        w = normalize_weights(weights, self.post.has_components(clusters))
        sp = lh_pc ** (1.0 / self.T) * w ** (1.0 / self.Tp)
        return normalize(sp, axis=-1)
