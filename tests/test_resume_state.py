"""Resume correctness: checkpointed state round-trips with full posterior
bookkeeping (regression for stale prior_parts after resume)."""
import pickle
from pathlib import Path

import numpy as np

FIXTURES = Path(__file__).parent / "fixtures"


def test_checkpoint_contains_parts_and_reload_is_consistent(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.config.schema import SBayesConfig
    from sbayes_tpu.data.loader import Data
    from sbayes_tpu.sampling.runner import MCMCSetup
    from sbayes_tpu.experiment import Experiment

    settings = {
        "results": {"path": str(tmp_path)},
        "mcmc": {"steps": 200, "samples": 10,
                 "warmup": {"warmup_steps": 20, "warmup_chains": 2}},
    }
    run_experiment(FIXTURES / "config.yaml", "ckpt", custom_settings=settings,
                   resume=False, i_run=0)

    state_path = tmp_path / "ckpt" / "K1" / "state_K1_0.pickle"
    with open(state_path, "rb") as f:
        d = pickle.load(f)
    assert "prior_parts" in d
    np.testing.assert_allclose(np.sum(d["prior_parts"]), d["log_prior"], rtol=1e-4, atol=1e-3)

    # reload through the runner: bookkeeping matches a fresh recompute
    experiment = Experiment(FIXTURES / "config.yaml", experiment_name="ckpt",
                            custom_settings=settings, log=False, i_run=0)
    data = Data.from_experiment(experiment)
    mcmc = MCMCSetup(data=data, experiment=experiment)
    state, i_step = mcmc._load_state_pickle(state_path)
    assert i_step == 200
    parts = mcmc.model.parts(state)
    np.testing.assert_allclose(float(state.log_lh), float(parts.log_lh), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(state.prior_parts), np.asarray(parts.prior_vector()), rtol=1e-4, atol=1e-3
    )

    # ---- legacy resume path: no pickle, reconstruct from clusters/stats
    # CSVs + source imputation (reference: mcmc_setup.py:203-245) ----
    state_path.unlink()
    state2, i_step2 = (
        mcmc._load_state_pickle(state_path) if state_path.exists()
        else mcmc._resume_from_results(run=0)
    )
    assert i_step2 == 201  # last sample id + 1
    assert np.isfinite(float(state2.log_lh))
    # clusters match the last logged sample
    from sbayes_tpu.results.results import Results

    res = Results.from_csv_files(
        tmp_path / "ckpt" / "K1" / "clusters_K1_0.txt",
        tmp_path / "ckpt" / "K1" / "stats_K1_0.txt",
        burn_in=0.0,
    )
    np.testing.assert_array_equal(np.asarray(state2.clusters), res.clusters[:, -1, :])
