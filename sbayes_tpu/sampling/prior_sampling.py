"""Sampling from the prior distribution (jittable, vmappable).

Counterpart of reference ``Prior.generate_sample`` (sbayes/model/prior.py:
108-137, 629-698 ``ClusterSizePrior.generate_sample``, 564-565, 620-626):
  * clusters: uniform component label per object (incl. "no cluster"),
    rejection-resampled until all sizes are within bounds (uniform_area),
  * weights: Dirichlet draws from the weights-prior concentration,
  * source: categorical draw from the per-object normalized weights.

Used by the statistical posterior-parity tests (importance sampling) and
by ``sample_from_prior`` tooling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sbayes_tpu.model.math import normalize_weights, sample_categorical_onehot
from sbayes_tpu.sampling.conditionals import Conditionals
from sbayes_tpu.sampling.state import ChainState


def generate_prior_clusters(key, cond: Conditionals):
    """Uniform-area cluster draw with size-bound rejection."""
    c = cond.consts
    K, N = c.K, c.N

    def draw(k):
        labels = jax.random.randint(k, (N,), 0, K + 1)
        clusters = jax.nn.one_hot(labels, K + 1, dtype=bool).T[:K]
        return clusters

    def in_bounds(clusters):
        sizes = clusters.sum(-1)
        return jnp.all((c.min_size <= sizes) & (sizes <= c.max_size))

    def cond_fn(carry):
        k, clusters, n_try = carry
        return (~in_bounds(clusters)) & (n_try < 10_000)

    def body_fn(carry):
        k, _, n_try = carry
        k1, k2 = jax.random.split(k)
        return k2, draw(k1), n_try + 1

    k1, k2 = jax.random.split(key)
    _, clusters, _ = lax.while_loop(cond_fn, body_fn, (k2, draw(k1), jnp.int32(0)))
    return clusters


def generate_prior_sample(key, cond: Conditionals) -> ChainState:
    c = cond.consts
    k_cl, k_w, k_s = jax.random.split(key, 3)

    clusters = generate_prior_clusters(k_cl, cond)
    weights = jax.random.dirichlet(k_w, jnp.asarray(c.conc_weights))  # (F, C)

    hc = cond.post.has_components(clusters)
    w_normed = normalize_weights(weights, hc)
    source = sample_categorical_onehot(k_s, w_normed) & ~jnp.asarray(c.na)[:, :, None]

    return ChainState(
        clusters=clusters,
        weights=weights.astype(jnp.float32),
        source=source,
        log_lh=jnp.float32(-jnp.inf),
        log_prior=jnp.float32(-jnp.inf),
        prior_parts=jnp.full((4,), -jnp.inf, jnp.float32),
    )


def generate_prior_samples(key, cond: Conditionals, n_samples: int) -> ChainState:
    """Batched prior samples with log-likelihood + geo-prior filled in
    (the importance weights of an IS posterior estimate are
    ``exp(log_lh + geo_prior)``, since the proposal covers all other
    prior factors)."""
    keys = jax.random.split(key, n_samples)

    def one(k):
        state = generate_prior_sample(k, cond)
        lh = cond.post.log_likelihood(state)
        geo = cond.post.geo_prior_per_cluster(state.clusters).sum()
        return state._replace(log_lh=lh, log_prior=geo)

    return jax.vmap(one)(keys)
