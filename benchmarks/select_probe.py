"""Subset-selection primitive timings at the headline shape (1024 chains).

After the MXU gather overhaul, subset SELECTION dominates the source
family: s_full 3.36 vs s_full_fixed 0.40 ms/step (source_ablation_probe).
This probe times candidate selection primitives in-scan to pick the
cheapest equivalent-distribution sampler.

    python benchmarks/select_probe.py

Requires the TPU tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

N = 100
M = 20
B = 1024
K = 3
GMAX = 6
NC = 2


def scan_time(stage_fn, n_steps=30):
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    clusters = jax.random.uniform(jax.random.PRNGKey(1), (B, K, N)) < 0.2
    groups = jax.random.uniform(jax.random.PRNGKey(2), (NC, GMAX, N)) < 0.3

    def run(keys, clusters, groups, n_steps):
        def body(carry, _):
            ks = carry
            split = jax.vmap(jax.random.split)(ks)
            ks, ka = split[:, 0], split[:, 1]
            out = jax.vmap(stage_fn, in_axes=(0, 0, None))(ka, clusters, groups)
            ks = jax.vmap(jax.random.fold_in)(ks, out.astype(jnp.uint32))
            return ks, None

        ks, _ = jax.lax.scan(body, keys, length=n_steps)
        return ks

    jitted = jax.jit(run, static_argnums=(3,))
    jax.block_until_ready(jitted(keys, clusters, groups, n_steps))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(keys, clusters, groups, n_steps))
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best * 1e3


def sel_none(key, clusters, groups):
    return jnp.uint32(1)


def sel_choice(key, clusters, groups):
    idx = jax.random.choice(key, N, shape=(M,), replace=False)
    return idx.sum()


def sel_argsort_unif(key, clusters, groups):
    u = jax.random.uniform(key, (N,))
    idx = jnp.argsort(u)[:M]
    return idx.sum()


def sel_topk_unif(key, clusters, groups):
    u = jax.random.uniform(key, (N,))
    _, idx = jax.lax.top_k(u, M)
    return idx.sum()


def sel_bits_topk(key, clusters, groups):
    # raw 32-bit keys, top_k on ints (no uniform conversion)
    u = jax.random.bits(key, (N,), jnp.uint32).astype(jnp.int32)
    _, idx = jax.lax.top_k(u, M)
    return idx.sum()


def sel_groups_topk(key, clusters, groups):
    # production groups selector: pick component, group, gumbel top-k
    k1, k2, k3 = jax.random.split(key, 3)
    comp = jax.random.randint(k1, (), 0, 1 + NC)
    stacked = jnp.concatenate([clusters] + [groups[c] for c in range(NC)], axis=0)
    n_groups = jnp.asarray([K, GMAX, GMAX], jnp.int32)
    g_idx = jax.random.randint(k2, (), 0, 10**9) % n_groups[comp]
    offsets = jnp.asarray([0, K, K + GMAX], jnp.int32)
    member = stacked[offsets[comp] + g_idx]
    scores = jnp.where(member, jax.random.gumbel(k3, (N,)), -jnp.inf)
    tv, ti = jax.lax.top_k(scores, M)
    return ti.sum() + jnp.isfinite(tv).sum()


def sel_groups_onehot_bits(key, clusters, groups):
    # same distribution: member row via one-hot matmul; uniform-without-
    # replacement within the group via random uint32 keys + top_k (ties
    # have measure ~2^-32 per pair; gumbel has the same float-ties caveat)
    k1, k2, k3 = jax.random.split(key, 3)
    comp = jax.random.randint(k1, (), 0, 1 + NC)
    stacked = jnp.concatenate([clusters] + [groups[c] for c in range(NC)], axis=0)
    n_groups = jnp.asarray([K, GMAX, GMAX], jnp.int32)
    g_idx = jax.random.randint(k2, (), 0, 10**9) % n_groups[comp]
    offsets = jnp.asarray([0, K, K + GMAX], jnp.int32)
    row = offsets[comp] + g_idx
    oh = jax.nn.one_hot(row, K + 2 * GMAX, dtype=jnp.bfloat16)
    member = jnp.dot(oh, stacked.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) > 0.5
    u = jax.random.bits(k3, (N,), jnp.uint32)
    scores = jnp.where(member, (u >> 1).astype(jnp.int32), -1)
    tv, ti = jax.lax.top_k(scores, M)
    return ti.sum() + (tv >= 0).sum()


def main():
    for name, fn in [
        ("none", sel_none),
        ("choice", sel_choice),
        ("argsort_unif", sel_argsort_unif),
        ("topk_unif", sel_topk_unif),
        ("bits_topk", sel_bits_topk),
        ("groups_topk", sel_groups_topk),
        ("groups_oh_bits", sel_groups_onehot_bits),
    ]:
        print(f"{name:15s}: {scan_time(fn):6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
