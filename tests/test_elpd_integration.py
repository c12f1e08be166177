"""ELPD tool end-to-end on real produced likelihood files."""
from pathlib import Path

import numpy as np

FIXTURES = Path(__file__).parent / "fixtures"


def test_elpd_over_produced_results(tmp_path):
    from sbayes_tpu.cli import run_experiment
    from sbayes_tpu.tools.elpd import main as elpd_main

    for k in (1, 2):
        run_experiment(
            FIXTURES / "config.yaml",
            "elpd_exp",
            custom_settings={
                "results": {"path": str(tmp_path)},
                "model": {"clusters": k},
                "mcmc": {"steps": 400, "samples": 20,
                         "warmup": {"warmup_steps": 20, "warmup_chains": 2}},
            },
            resume=False,
            i_run=0,
        )

    plot = tmp_path / "elpd.png"
    df = elpd_main(tmp_path, burnin=0.1, plot_path=plot)
    assert len(df) == 2
    assert set(df.k) == {1, 2}
    assert np.all(np.isfinite(df.elpd_loo))
    assert plot.exists()
