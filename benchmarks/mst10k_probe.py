"""MST engine shoot-out at N=10k (VERDICT r4 #5: Borůvka's hypothesis).

ops/boruvka.py (log-depth dense contraction) was built in round 3 on the
hypothesis that it beats the early-exit masked Prim when clusters are
large (Prim's while_loop runs to the batch-max cluster size under vmap,
and at N > 2048 the prim_mm MXU row-select re-reads the whole (N, N)
cost matrix per iteration). This probe times all three engines on the
carried geo-aggregate update shape at N=10k: a vmapped batch of cluster
masks of realistic sizes (the 10k workload uses K=5, clusters of
~200-2000 objects).

    python benchmarks/mst10k_probe.py [n_objects batch]
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


def run(n=10_000, batch=8):
    from sbayes_tpu.ops.boruvka import cluster_mst_stats as boruvka_stats
    from sbayes_tpu.ops.mst import (
        cluster_mst_edge_costs,
        cluster_mst_stats_prim,
    )

    rng = np.random.default_rng(0)
    pts = rng.random((n, 2)).astype(np.float32)
    cost = np.linalg.norm(pts[:, None, :2] - pts[None, :, :2], axis=-1)
    cost = jnp.asarray(cost)

    masks = []
    for b in range(batch):
        size = int(rng.integers(200, 2000))
        idx = rng.choice(n, size, replace=False)
        m = np.zeros(n, bool)
        m[idx] = True
        masks.append(m)
    masks = jnp.asarray(np.stack(masks))
    sizes = [int(m.sum()) for m in np.asarray(masks)]
    print(f"N={n}, batch={batch}, cluster sizes {sizes}")

    def prim(cost, mask):
        e, c = cluster_mst_edge_costs(cost, mask)
        return e.sum(), c.astype(cost.dtype), e.max()

    engines = {
        "prim": prim,
        "prim_mm": cluster_mst_stats_prim,
        "boruvka": boruvka_stats,
    }
    ref = None
    for name, fn in engines.items():
        f = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
        out = jax.block_until_ready(f(cost, masks))
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = f(cost, masks)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        tot = np.asarray(out[0])
        if ref is None:
            ref = tot
        ok = np.allclose(tot, ref, rtol=1e-5)
        print(f"{name:8s}: {dt:8.2f} ms/batch-eval  totals-match={ok}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
