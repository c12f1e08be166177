"""Per-operator-family stationarity under the prior.

Run sample-from-prior MCMC with ONLY the cluster operator family enabled:
if any grow/shrink/wide/jump proposal asymmetry (log_q/log_q_back) were
wrong, the chain would drift away from the prior's membership marginals.
(The reference sketches per-operator stationarity tests but leaves them
commented out; this is the live version.)
"""
from pathlib import Path

import numpy as np
import pytest
from scipy.stats import binomtest

import jax

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.mark.slow
def test_cluster_operators_preserve_prior(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.results.results import Results
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_samples

    settings = {
        "results": {"path": str(tmp_path)},
        "mcmc": {
            "steps": 12_000, "samples": 200, "sample_from_prior": True,
            # clusters-only schedule
            "operators": {"clusters": 1.0, "weights": 0.0, "source": 0.0},
        },
        "model": {"clusters": 2, "prior": {"geo": {"type": "uniform"}}},
    }
    run_experiment(FIXTURES / "config.yaml", "stat_clusters", custom_settings=settings,
                   resume=False, i_run=0)
    results = Results.from_csv_files(
        tmp_path / "stat_clusters" / "K2" / "clusters_K2_0.txt",
        tmp_path / "stat_clusters" / "K2" / "stats_K2_0.txt",
        burn_in=0.1,
    )

    config = SBayesConfig.from_config_file(FIXTURES / "config.yaml", custom_settings=settings)
    data = Data.from_config(config)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ref = generate_prior_samples(jax.random.PRNGKey(5), cond, 4000)
    p_ref = np.asarray(ref.clusters).any(axis=1).mean(axis=0)

    in_any = results.clusters.any(axis=0)
    n = results.n_samples
    failures = []
    for o in range(results.n_objects):
        p = float(np.clip(p_ref[o], 1e-9, 1 - 1e-9))
        pv = binomtest(k=int(in_any[:, o].sum()), n=n, p=p).pvalue
        if pv <= 0.005:
            failures.append(f"object {o}: mcmc={in_any[:, o].mean():.3f} prior={p:.3f} p={pv:.4f}")
    assert not failures, "cluster-family stationarity violations:\n" + "\n".join(failures)
