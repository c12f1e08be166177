"""Batched row gather/scatter on the per-chain source tensor: TPU gather
vs one-hot MXU matmul, at the south_america headline shape.

The branch probe shows the source family at 8.76 ms/ensemble-step (1024
chains) while the clusters family — which streams full (B,N,F) marginal
temporaries — runs at 2.83 ms: the suspects are the (B, m) per-chain row
gathers `source[obj_idx]` and the deferred-write scatter, which lower to
serialized scalar-core loops on TPU (same pathology the prim_mm MST
engine fixed for cost-matrix rows).

    python benchmarks/rows_gather_probe.py [n_chains N F C m]
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


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def run(B=1024, N=100, F=36, C=3, m=20):
    key = jax.random.PRNGKey(0)
    src = jax.random.bernoulli(key, 0.3, (B, N, F, C))
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, m), 0, N)
    rows_new = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (B, m, F, C))

    # --- gather forms ---
    @jax.jit
    def g_gather(src, idx):
        return jax.vmap(lambda s, i: s[i])(src, idx)

    @jax.jit
    def g_onehot(src, idx):
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)           # (B, m, N)
        flat = src.reshape(B, N, F * C).astype(jnp.bfloat16)
        out = jnp.einsum("bmn,bnx->bmx", oh, flat,
                         preferred_element_type=jnp.float32)
        return (out > 0.5).reshape(B, m, F, C)

    # --- scatter forms (drop out-of-bounds) ---
    @jax.jit
    def s_scatter(src, idx, rows):
        return jax.vmap(lambda s, i, r: s.at[i].set(r, mode="drop"))(
            src, idx, rows)

    @jax.jit
    def s_onehot(src, idx, rows):
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)           # (B, m, N)
        old = jnp.einsum("bmn,bnx->bmx", oh,
                         src.reshape(B, N, F * C).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        delta = rows.reshape(B, m, F * C).astype(jnp.float32) - old
        upd = jnp.einsum("bmn,bmx->bnx", oh.astype(jnp.float32), delta,
                         preferred_element_type=jnp.float32)
        return ((src.reshape(B, N, F * C).astype(jnp.float32) + upd) > 0.5
                ).reshape(B, N, F, C)

    a = g_gather(src, idx)
    b = g_onehot(src, idx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = s_scatter(src, idx, rows_new)
    print(f"gather  (vmap s[i])    : {timeit(g_gather, src, idx)*1e3:7.3f} ms")
    print(f"gather  (one-hot MXU)  : {timeit(g_onehot, src, idx)*1e3:7.3f} ms")
    print(f"scatter (vmap at[].set): {timeit(s_scatter, src, idx, rows_new)*1e3:7.3f} ms")
    print(f"scatter (one-hot MXU)  : {timeit(s_onehot, src, idx, rows_new)*1e3:7.3f} ms")
    del c


if __name__ == "__main__":
    run(*[int(a) for a in sys.argv[1:]])
