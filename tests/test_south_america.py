"""Integration test on the real south_america case study data.

Reads the reference repo's bundled dataset (read-only) — 100 languages x
36 features, 6 families, Dirichlet file priors — and runs a short
analysis, checking that the full real-data path (custom projection, prior
count files, K=3 cluster matching) works.
"""
from pathlib import Path

import numpy as np
import pytest

SA_CONFIG = Path("/root/reference/experiments/south_america/config.yaml")


@pytest.mark.slow
@pytest.mark.skipif(not SA_CONFIG.exists(), reason="reference dataset not available")
def test_south_america_short_run(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.results.results import Results

    run_experiment(
        config=SA_CONFIG,
        experiment_name="sa_test",
        custom_settings={
            "results": {"path": str(tmp_path)},
            "mcmc": {
                "steps": 600,
                "samples": 20,
                "runs": 1,
                "warmup": {"warmup_steps": 50, "warmup_chains": 2},
                "initialization": {"attempts": 2, "em_steps": 10},
            },
        },
        resume=False,
        i_run=0,
    )

    res = Results.from_csv_files(
        tmp_path / "sa_test" / "K3" / "clusters_K3_0.txt",
        tmp_path / "sa_test" / "K3" / "stats_K3_0.txt",
        burn_in=0.0,
    )
    assert res.n_clusters == 3
    assert res.n_objects == 100
    assert res.n_features == 36
    assert set(res.confounders) == {"universal", "family"}
    assert len(res.groups_by_confounders["family"]) == 6
    assert np.all(np.isfinite(res.likelihood))
    # log_source: true in the config -> source_* columns present
    assert any(c.startswith("source_clusters_") for c in res.parameters.columns)
    # sizes within prior bounds
    sizes = res.clusters.sum(-1)
    assert sizes.min() >= 3 and sizes.max() <= 100
