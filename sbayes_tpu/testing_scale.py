"""Vectorized synthetic data generator for large-scale workloads.

``sbayes_tpu.testing.synthetic_data`` draws each observation in a Python
loop (fine at 100x36); this generator is fully vectorized for the
10k x 5k scale-up workload (BASELINE.json configs[4]).
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np

from sbayes_tpu.data.loader import Confounder, Data, Features, Objects


def synthetic_data_large(
    n_objects: int = 10_000,
    n_features: int = 5_000,
    n_states: int = 5,
    n_families: int = 10,
    na_fraction: float = 0.01,
    seed: int = 0,
) -> Data:
    import sys
    import time as _t

    def _stage(msg):
        print(f"  [datagen +{_t.perf_counter() - _t0:.0f}s] {msg}", file=sys.stderr, flush=True)

    _t0 = _t.perf_counter()
    rng = np.random.default_rng(seed)

    locations = rng.uniform(-75, -35, size=(n_objects, 2))
    ids = [f"o{i}" for i in range(n_objects)]
    objects = Objects(id=ids, locations=locations, names=list(ids))

    applicable = np.ones((n_features, n_states), dtype=bool)

    family_of = rng.integers(0, n_families, size=n_objects)
    probs = rng.dirichlet(np.ones(n_states), size=(n_families, n_features))

    # Vectorized categorical draw: inverse-CDF over the state axis.
    # f32 throughout — the f64 (N, F, S) cdf alone is 2 GB at 10k x 5k.
    _stage("drawing features")
    cdf = np.cumsum(probs[family_of].astype(np.float32), axis=-1)  # (N, F, S)
    u = rng.random((n_objects, n_features, 1), dtype=np.float32)
    idx = (u > cdf).sum(-1)                              # (N, F)
    del cdf, u
    values = idx[:, :, None] == np.arange(n_states)[None, None, :]

    na_mask = rng.random((n_objects, n_features)) < na_fraction
    values[na_mask] = False

    _stage("features drawn")
    state_names = [[f"s{j}" for j in range(n_states)] for _ in range(n_features)]
    features = Features(
        values=values,
        names=np.asarray([f"f{j}" for j in range(n_features)]),
        states=applicable,
        state_names=state_names,
        na_number=int(na_mask.sum()),
    )

    fam_names = [f"fam{i}" for i in range(n_families)]
    fam_assign = family_of[None, :] == np.arange(n_families)[:, None]
    confounders = OrderedDict(
        universal=Confounder("universal", np.ones((1, n_objects), bool), ["<ALL>"]),
        family=Confounder("family", fam_assign, fam_names),
    )

    # projection=None: planar distances (skips the 10k x 10k geodesic solve)
    _stage("building Data (Delaunay + distance matrix)")
    data = Data(objects=objects, features=features, confounders=confounders,
                projection=None, geo_costs="from_data")
    _stage("Data ready")
    return data
