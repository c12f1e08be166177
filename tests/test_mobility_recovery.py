"""End-to-end on the reference's SECOND bundled experiment
(mobility_behaviour): simulate features with OUR simulation engine from
the reference's own simulation config + canvas (ground-truth clusters),
run the full sampler on the simulated data with the experiment's model
config, and check the posterior recovers the planted clusters.

Covers the simulation -> loader -> sampler integration with a non-geo
model and an `age` confounder (reference:
experiments/mobility_behaviour/{config.yaml, simulation/}).
"""
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF_EXP = Path("/root/reference/experiments/mobility_behaviour")


@pytest.mark.slow
def test_mobility_behaviour_cluster_recovery(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.results.results import Results
    from sbayes_tpu.simulation import Simulation

    # --- simulate with the reference's sim config + canvas ---
    sim_dir = tmp_path / "simulation"
    sim_dir.mkdir()
    shutil.copy(REF_EXP / "simulation" / "canvas_mobility.csv", sim_dir)
    import json

    cfg = json.loads((REF_EXP / "simulation" / "config_simulation.json").read_text())
    cfg["seed"] = 7
    (sim_dir / "config_simulation.json").write_text(json.dumps(cfg))

    sim = Simulation(log=False)
    sim.load_config_simulation(sim_dir / "config_simulation.json")
    sim.run_simulation()
    sim.write_to_csv()
    feat_csv = tmp_path / "data" / "features" / "simulated_features.csv"
    states_csv = tmp_path / "data" / "features" / "simulated_feature_states.csv"
    assert feat_csv.exists() and states_csv.exists()

    # --- run the experiment config on the simulated data (shortened) ---
    results_dir = tmp_path / "results"
    run_experiment(
        config=REF_EXP / "config.yaml",
        experiment_name="mob",
        custom_settings={
            "data": {"features": str(feat_csv), "feature_states": str(states_csv)},
            "mcmc": {
                "steps": 20000, "samples": 100,
                "warmup": {"warmup_steps": 1000, "warmup_chains": 3},
            },
            "results": {"path": str(results_dir)},
        },
        i_run=0,
    )
    res = Results.from_csv_files(results_dir / "mob" / "K2" / "clusters_K2_0.txt",
                                 results_dir / "mob" / "K2" / "stats_K2_0.txt")

    # --- recovery: posterior memberships vs the canvas ground truth ---
    canvas = pd.read_csv(REF_EXP / "simulation" / "canvas_mobility.csv")
    truth = canvas["cluster"].to_numpy()          # 1 or 2 for every object
    # posterior marginal membership over the second half of the samples
    clusters = np.asarray(res.clusters)            # (K, n_samples, N)
    half = clusters.shape[1] // 2
    marg = clusters[:, half:].mean(axis=1)         # (K, N)

    # each inferred cluster's confident members (p > 0.5) must be PURE in
    # one true cluster (the model caps clusters at 50 < true sizes 60/66,
    # so full recall is impossible by design; purity is the right check)
    purities = []
    for k in range(marg.shape[0]):
        members = marg[k] > 0.5
        assert members.sum() >= 10, f"cluster {k} nearly empty ({members.sum()})"
        counts = pd.Series(truth[members]).value_counts()
        purities.append(counts.iloc[0] / members.sum())
    assert min(purities) > 0.9, f"cluster purity too low: {purities}"
    # and the two inferred clusters must pick up DIFFERENT true clusters
    tops = [pd.Series(truth[marg[k] > 0.5]).value_counts().index[0]
            for k in range(marg.shape[0])]
    assert len(set(tops)) == marg.shape[0], f"both clusters match truth {tops}"
