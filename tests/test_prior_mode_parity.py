"""Sampling-from-prior mode: the MCMC must reproduce the prior itself.

Runs the full operator suite with sample_from_prior=true and compares
cluster-size and membership marginals against direct prior draws. This
validates that every operator's proposal asymmetry correction is exact
under the prior (a complementary check to the posterior-parity tests).
"""
from pathlib import Path

import numpy as np
import pytest
from scipy.stats import binomtest

import jax

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.mark.slow
def test_prior_mode_matches_direct_prior(tmp_path):
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
        "mcmc": {"steps": 12_000, "samples": 200, "sample_from_prior": True},
        # uniform geo prior: in prior mode the MCMC targets the prior
        # including the geo factor, while direct prior draws do not
        # (the reference IS harness reweights by geo for the same reason).
        "model": {"prior": {"geo": {"type": "uniform"}}},
    }
    run_experiment(FIXTURES / "config.yaml", "prior_parity", custom_settings=settings,
                   resume=False, i_run=0)
    results = Results.from_csv_files(
        tmp_path / "prior_parity" / "K1" / "clusters_K1_0.txt",
        tmp_path / "prior_parity" / "K1" / "stats_K1_0.txt",
        burn_in=0.1,
    )
    np.testing.assert_allclose(results.likelihood, 0.0, atol=1e-6)

    config = SBayesConfig.from_config_file(FIXTURES / "config.yaml", custom_settings=settings)
    data = Data.from_config(config)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ref = generate_prior_samples(jax.random.PRNGKey(17), cond, 4000)
    p_ref = np.asarray(ref.clusters).any(axis=1).mean(axis=0)  # per-object prior marginal

    in_any = results.clusters.any(axis=0)
    n = results.n_samples
    failures = []
    for o in range(results.n_objects):
        p = float(np.clip(p_ref[o], 1e-9, 1 - 1e-9))
        pv = binomtest(k=int(in_any[:, o].sum()), n=n, p=p).pvalue
        if pv <= 0.005:
            failures.append(f"object {o}: mcmc={in_any[:, o].mean():.3f} prior={p:.3f} p={pv:.4f}")
    assert not failures, "\n".join(failures)
