"""Statistical correctness: MCMC posterior vs importance-sampling reference.

The same strategy as the reference's crown-jewel test
(test/test_operators.py:233-329): run a real (tiny) analysis, then compare
per-object cluster-membership marginals against an importance-sampling
estimate built from 2000 prior samples weighted by exp(log_lh + geo_prior)
(the prior proposal covers all other prior factors). Exact binomial tests
must not reject at p=0.01.

This is the test that catches proposal-asymmetry (log_q/log_q_back) bugs.
"""
from pathlib import Path

import numpy as np
import pytest
from scipy.stats import binomtest

import jax

FIXTURES = Path(__file__).parent / "fixtures"
N_REFERENCE_SAMPLES = 3000


@pytest.mark.slow
def test_posterior_parity(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.model.model import Model
    from sbayes_tpu.model.posterior import Posterior
    from sbayes_tpu.results.results import Results
    from sbayes_tpu.sampling.conditionals import Conditionals
    from sbayes_tpu.sampling.prior_sampling import generate_prior_samples

    # ---- run the analysis ----
    settings = {
        "results": {"path": str(tmp_path)},
        "mcmc": {"steps": 10_000, "samples": 200},
    }
    run_experiment(
        config=FIXTURES / "config.yaml",
        experiment_name="parity",
        custom_settings=settings,
        resume=False,
        i_run=0,
    )
    results = Results.from_csv_files(
        tmp_path / "parity" / "K1" / "clusters_K1_0.txt",
        tmp_path / "parity" / "K1" / "stats_K1_0.txt",
        burn_in=0.1,
    )

    # ---- importance-sampling reference ----
    config = SBayesConfig.from_config_file(FIXTURES / "config.yaml", custom_settings=settings)
    data = Data.from_config(config)
    model = Model(data, config.model)
    cond = Conditionals(Posterior(model.consts), 1.0, 1.0)

    ref = generate_prior_samples(jax.random.PRNGKey(7), cond, N_REFERENCE_SAMPLES)
    log_w = np.asarray(ref.log_lh) + np.asarray(ref.log_prior)  # log_prior holds geo prior
    log_w -= log_w.max()
    w = np.exp(log_w)
    w /= w.sum()
    ref_clusters = np.asarray(ref.clusters)  # (n_ref, K, N)

    # effective sample size sanity of the IS estimate
    ess = 1.0 / np.sum(w**2)
    assert ess > 50, f"IS reference degenerate (ESS={ess:.1f})"

    n_samples = results.n_samples
    failures = []
    for i_clust in range(results.n_clusters):
        cluster_trace = results.clusters[i_clust]  # (n_samples, N)
        for i_obj in range(results.n_objects):
            p_ref = float(w @ ref_clusters[:, i_clust, i_obj])
            k = int(np.sum(cluster_trace[:, i_obj]))
            p_value = binomtest(k=k, n=n_samples, p=p_ref).pvalue
            if p_value <= 0.01:
                failures.append(
                    f"cluster {i_clust} object {i_obj}: mcmc={k / n_samples:.3f} "
                    f"ref={p_ref:.3f} p={p_value:.4f}"
                )

        # overall size check
        p_ref_size = float((w @ ref_clusters[:, i_clust, :].astype(float)).mean())
        p_value_size = binomtest(
            k=int(np.sum(cluster_trace)), n=n_samples * results.n_objects, p=p_ref_size
        ).pvalue
        if p_value_size <= 0.01:
            failures.append(
                f"cluster {i_clust} size: mcmc={np.sum(cluster_trace) / (n_samples * results.n_objects):.3f} "
                f"ref={p_ref_size:.3f} p={p_value_size:.4f}"
            )

    assert not failures, "Posterior parity violations:\n" + "\n".join(failures)

    # ---- weights marginal parity (looser: posterior means within IS MC error) ----
    w_ref = np.asarray(ref.weights)  # (n_ref, F, C)
    mean_ref = np.einsum("r,rfc->fc", w, w_ref)
    # IS standard error of the mean per component
    se_ref = np.sqrt(np.einsum("r,rfc->fc", w**2, (w_ref - mean_ref[None]) ** 2))
    mcmc_means = np.stack(
        [results.weights[f].mean(axis=0) for f in results.feature_names]
    )  # (F, C)
    # MCMC has its own (autocorrelated) error; allow a generous combined band
    err = np.abs(mcmc_means - mean_ref)
    tol = 6 * se_ref + 0.05
    assert np.all(err < tol), (
        f"weights marginals off:\nmcmc=\n{mcmc_means}\nref=\n{mean_ref}\nse=\n{se_ref}"
    )
