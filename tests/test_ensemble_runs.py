"""Multi-run ensemble: all `runs` execute as one vmapped batch via the CLI."""
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


def test_cli_multi_run_ensemble(tmp_path):
    from sbayes_tpu.cli import main
    from sbayes_tpu.results.results import Results

    main(
        config=FIXTURES / "config.yaml",
        experiment_name="ens",
        custom_settings={
            "results": {"path": str(tmp_path)},
            "mcmc": {"steps": 200, "samples": 10, "runs": 3,
                     "warmup": {"warmup_steps": 20, "warmup_chains": 2}},
        },
        processes=1,
        resume=False,
    )

    lls = []
    for r in range(3):
        stats = tmp_path / "ens" / "K1" / f"stats_K1_{r}.txt"
        clusters = tmp_path / "ens" / "K1" / f"clusters_K1_{r}.txt"
        assert stats.exists() and clusters.exists(), f"missing run {r} files"
        res = Results.from_csv_files(clusters, stats, burn_in=0.0)
        assert res.n_samples == 10
        lls.append(res.likelihood)
    # runs are independent: their trajectories differ
    assert not np.allclose(lls[0], lls[1])
    assert not np.allclose(lls[1], lls[2])


def test_cli_multi_run_ensemble_with_refresh(tmp_path, monkeypatch):
    """Ensemble loop with the carried-invariant refresh forced to every
    chunk: exercises _refresh_states_jit over the sharded run batch."""
    import sbayes_tpu.sampling.runner as runner_mod
    from sbayes_tpu.cli import main

    monkeypatch.setattr(runner_mod, "REFRESH_EVERY_CHUNKS", 1)
    main(
        config=FIXTURES / "config.yaml",
        experiment_name="ensr",
        custom_settings={
            "results": {"path": str(tmp_path)},
            "mcmc": {"steps": 60, "samples": 6, "runs": 2,
                     "warmup": {"warmup_steps": 20, "warmup_chains": 2}},
        },
        processes=1,
        resume=False,
    )
    for r in range(2):
        assert (tmp_path / "ensr" / "K1" / f"stats_K1_{r}.txt").exists()
