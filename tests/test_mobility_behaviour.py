"""mobility_behaviour end-to-end: simulation -> analysis (BASELINE.json
configs[2]; reference pattern: test/test_sbayes_experiment.py:28-43).

Simulates features from the bundled canvas with the age confounder, then
runs the analysis config (uniform_size prior, K=2, age groups
young/working/elderly) on the simulated CSVs and checks the artifacts.
"""
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

MOBILITY = Path("/root/reference/experiments/mobility_behaviour")


@pytest.mark.slow
@pytest.mark.skipif(not MOBILITY.exists(), reason="reference dataset not available")
def test_mobility_simulation_and_run(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.results.results import Results
    from sbayes_tpu.simulation import main as simulation_main

    # --- simulation (results path redirected out of the read-only repo) ---
    simdir = tmp_path / "sim"
    simdir.mkdir()
    shutil.copy(MOBILITY / "simulation" / "canvas_mobility.csv", simdir)
    sim_cfg = json.loads((MOBILITY / "simulation" / "config_simulation.json").read_text())
    sim_cfg["results"]["path"] = str(tmp_path / "features")
    (simdir / "config_simulation.json").write_text(json.dumps(sim_cfg))
    simulation_main(simdir / "config_simulation.json")

    feat_csv = tmp_path / "features" / "simulated_features.csv"
    states_csv = tmp_path / "features" / "simulated_feature_states.csv"
    assert feat_csv.exists() and states_csv.exists()

    # --- analysis with the real mobility config + age confounder ---
    run_experiment(
        config=MOBILITY / "config.yaml",
        experiment_name="mobility_test",
        custom_settings={
            "data": {"features": str(feat_csv), "feature_states": str(states_csv)},
            "results": {"path": str(tmp_path / "results")},
            "mcmc": {
                "steps": 300, "samples": 15, "runs": 1,
                "warmup": {"warmup_steps": 20, "warmup_chains": 2},
                "initialization": {"attempts": 2, "em_steps": 5},
            },
        },
        resume=False,
        i_run=0,
    )

    out = tmp_path / "results" / "mobility_test" / "K2"
    res = Results.from_csv_files(
        out / "clusters_K2_0.txt", out / "stats_K2_0.txt", burn_in=0.0,
    )
    assert res.n_samples == 15
    assert res.n_clusters == 2
    assert res.n_features == sim_cfg["n_features"]
    assert set(res.confounders) == {"age"}
    assert set(res.groups_by_confounders["age"]) == {"young", "working", "elderly"}
    assert np.all(np.isfinite(res.likelihood))
    # uniform_size prior bounds hold
    sizes = res.clusters.sum(-1)
    assert sizes.min() >= 3 and sizes.max() <= 50
