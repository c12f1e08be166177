"""Posterior parity beyond the reference's test coverage:

* K=2 (exercises the cluster-jump operator's proposal asymmetry),
* MC3 cold chain (exercises swap correctness end-to-end).

Both compare MCMC cluster-membership marginals against an
importance-sampling prior-weighted reference with exact binomial tests.
The marginal compared is "object o is in ANY cluster" (label-permutation
invariant, so K=2 label switching cannot break the test).
"""
from pathlib import Path

import numpy as np
import pytest
from scipy.stats import binomtest

import jax

FIXTURES = Path(__file__).parent / "fixtures"
N_REF = 4000


def _is_reference(config, seed=7):
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_samples

    data = Data.from_config(config)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)
    ref = generate_prior_samples(jax.random.PRNGKey(seed), cond, N_REF)
    log_w = np.asarray(ref.log_lh) + np.asarray(ref.log_prior)
    log_w -= log_w.max()
    w = np.exp(log_w)
    w /= w.sum()
    ess = 1.0 / np.sum(w**2)
    assert ess > 50, f"IS reference degenerate (ESS={ess:.1f})"
    in_any = np.asarray(ref.clusters).any(axis=1)  # (n_ref, N)
    return w @ in_any  # per-object P(in any cluster)


def _check_marginals(results, p_ref, alpha=0.005):
    in_any = results.clusters.any(axis=0)  # (n_samples, N)
    n = results.n_samples
    failures = []
    for o in range(results.n_objects):
        p = float(np.clip(p_ref[o], 1e-9, 1 - 1e-9))
        pv = binomtest(k=int(in_any[:, o].sum()), n=n, p=p).pvalue
        if pv <= alpha:
            failures.append(f"object {o}: mcmc={in_any[:, o].mean():.3f} ref={p:.3f} p={pv:.4f}")
    assert not failures, "\n".join(failures)


@pytest.mark.slow
def test_posterior_parity_k2(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.results.results import Results

    settings = {
        "results": {"path": str(tmp_path)},
        "model": {"clusters": 2},
        "mcmc": {"steps": 12_000, "samples": 200},
    }
    run_experiment(FIXTURES / "config.yaml", "parity_k2", custom_settings=settings,
                   resume=False, i_run=0)
    results = Results.from_csv_files(
        tmp_path / "parity_k2" / "K2" / "clusters_K2_0.txt",
        tmp_path / "parity_k2" / "K2" / "stats_K2_0.txt",
        burn_in=0.1,
    )
    config = SBayesConfig.from_config_file(FIXTURES / "config.yaml", custom_settings=settings)
    p_ref = _is_reference(config)
    _check_marginals(results, p_ref)


@pytest.mark.slow
def test_posterior_parity_mc3_cold_chain(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.results.results import Results

    settings = {
        "results": {"path": str(tmp_path)},
        "mcmc": {
            "steps": 12_000, "samples": 200,
            "mc3": {"activate": True, "chains": 3, "swap_interval": 60,
                    "temperature_diff": 0.3},
        },
    }
    run_experiment(FIXTURES / "config.yaml", "parity_mc3", custom_settings=settings,
                   resume=False, i_run=0)
    results = Results.from_csv_files(
        tmp_path / "parity_mc3" / "K1" / "clusters_K1_0.txt",
        tmp_path / "parity_mc3" / "K1" / "stats_K1_0.txt",
        burn_in=0.1,
    )
    config = SBayesConfig.from_config_file(FIXTURES / "config.yaml", custom_settings=settings)
    p_ref = _is_reference(config)
    _check_marginals(results, p_ref)
