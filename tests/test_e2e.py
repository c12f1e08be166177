"""End-to-end smoke tests: full CLI run on the bundled tiny fixture.

Mirrors the reference integration-test strategy (test/test_sbayes_experiment.py):
pass criterion is a clean run producing parseable results files, plus
resume support.
"""
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture()
def results_dir(tmp_path):
    return tmp_path / "results"


def _run(results_dir, custom=None, resume=False, name="e2e"):
    from sbayes_tpu.cli import run_experiment

    settings = {"results": {"path": str(results_dir)}}
    if custom:
        from sbayes_tpu.utils import update_recursive

        update_recursive(settings, custom)
    run_experiment(
        config=FIXTURES / "config.yaml",
        experiment_name=name,
        custom_settings=settings,
        resume=resume,
        i_run=0,
    )
    return results_dir / name / "K1"


def test_resume_continues_partial_run(results_dir):
    # First run: half the steps at the same sample spacing
    out = _run(results_dir, custom={"mcmc": {"steps": 200, "samples": 10}}, name="resume")
    n_before = len((out / "clusters_K1_0.txt").read_text().splitlines())
    assert n_before == 10
    # Resume with the full schedule: continues from step 200 and appends
    _run(results_dir, custom={"mcmc": {"steps": 400, "samples": 20}}, resume=True, name="resume")
    n_after = len((out / "clusters_K1_0.txt").read_text().splitlines())
    assert n_after == 20


def test_full_run_produces_results(results_dir):
    out = _run(results_dir)

    # log file uses the reference naming (experiment_K{K}_{run}.log,
    # ref experiment_setup.py:70-76)
    assert (out.parent / "experiment_K1_0.log").exists()

    stats = out / "stats_K1_0.txt"
    clusters = out / "clusters_K1_0.txt"
    lh_h5 = out / "likelihood_K1_0.h5"
    op_stats = out / "operator_stats_K1_0.txt"
    state = out / "state_K1_0.pickle"
    for p in (stats, clusters, lh_h5, op_stats, state):
        assert p.exists(), f"missing results file {p}"

    # Results reader round-trip
    from sbayes_tpu.results.results import Results

    res = Results.from_csv_files(clusters, stats, burn_in=0.0)
    assert res.n_samples == 20
    assert res.n_objects == 5
    assert res.n_clusters == 1
    assert res.feature_names == ["F1", "F2"]
    assert set(res.confounders) == {"universal", "family"}
    assert np.all(np.isfinite(res.likelihood))
    # weights rows: areal + 2 confounders
    w = res.weights["F1"]
    assert w.shape[1] == 3
    # effect probabilities sum to 1 over states
    areal = res.areal_effect["a0"]
    np.testing.assert_allclose(
        areal["F1"].sum(-1), 1.0, atol=1e-5
    )

    # likelihood h5: correct shape, finite, reference dataset names
    import h5py

    with h5py.File(lh_h5) as f:
        assert f["likelihood"].shape == (20, 10)
        assert f["na_values"].shape == (10,)
        lh = np.asarray(f["likelihood"])
        na = np.asarray(f["na_values"])
        assert np.all(lh[:, ~na] > 0)

    # operator stats: header + one row per op
    txt = op_stats.read_text()
    assert "OPERATOR" in txt and "ACCEPT-RATE" in txt
    assert "gibbs_sample_weights" in txt

    # integer columns written exactly (no %.8g rounding of the step id)
    lines = stats.read_text().splitlines()
    header = lines[0].split("\t")
    first = dict(zip(header, lines[1].split("\t")))
    assert first["Sample"] == "20"
    assert "." not in first["size_a0"] and "e" not in first["size_a0"]


def test_cli_resume_flag_parsing():
    """argparse `type=bool` would make --resume False truthy (the
    reference's wart, cli.py:142-146); ours parses boolean strings."""
    import argparse

    from sbayes_tpu.cli import _str2bool

    assert _str2bool("False") is False and _str2bool("0") is False
    assert _str2bool("true") is True and _str2bool("1") is True
    with pytest.raises(argparse.ArgumentTypeError):
        _str2bool("maybe")


def test_resume_of_finished_run_is_noop(results_dir):
    out = _run(results_dir)
    n_lines_before = len((out / "clusters_K1_0.txt").read_text().splitlines())
    _run(results_dir, resume=True)
    n_lines_after = len((out / "clusters_K1_0.txt").read_text().splitlines())
    assert n_lines_after == n_lines_before


def test_sample_from_prior_mode(results_dir):
    out = _run(results_dir, custom={"mcmc": {"sample_from_prior": True}}, name="prior_mode")
    from sbayes_tpu.results.results import Results

    res = Results.from_csv_files(out / "clusters_K1_0.txt", out / "stats_K1_0.txt", burn_in=0.0)
    np.testing.assert_allclose(res.likelihood, 0.0, atol=1e-6)


def test_contribution_per_cluster_columns(results_dir):
    out = _run(
        results_dir,
        custom={
            "mcmc": {"steps": 100, "samples": 5},
            "model": {"clusters": 2},
            "results": {"log_contribution_per_cluster": True},
        },
        name="contrib",
    )
    stats = (results_dir / "contrib" / "K2" / "stats_K2_0.txt").read_text().splitlines()
    header = stats[0].split("\t")
    for col in ("post_a0", "lh_a0", "prior_a0", "post_a1", "lh_a1", "prior_a1"):
        assert col in header, f"missing column {col}"
    # reference column order: contributions come right before the priors
    assert header.index("prior_a1") < header.index("cluster_size_prior")
    row = dict(zip(header, stats[1].split("\t")))
    for i in (0, 1):
        lh_i, pr_i, po_i = (float(row[f"{k}_a{i}"]) for k in ("lh", "prior", "post"))
        # lh_a* is a source-marginalized mixture log-likelihood: finite and
        # negative (it is NOT comparable to the collapsed `likelihood` column)
        assert np.isfinite(lh_i) and np.isfinite(pr_i) and lh_i < 0
        np.testing.assert_allclose(po_i, lh_i + pr_i, rtol=1e-5, atol=1e-4)


def test_operator_step_times_are_measured(results_dir):
    out = _run(results_dir, custom={"mcmc": {"steps": 100, "samples": 5}}, name="optimes")
    txt = (out / "operator_stats_K1_0.txt").read_text().splitlines()
    assert txt[0].startswith("#") and "probe estimate" in txt[0]
    txt = [line for line in txt if not line.startswith("#")]
    header = txt[0]
    i_col = header.index("STEP-TIME")
    times = []
    for line in txt[1:]:
        cell = line[i_col:].split("ms")[0].strip()
        if cell and cell != "-":
            times.append(float(cell))
    assert times and all(t >= 0 for t in times)


def test_mc3_sample_cadence_independent_of_swaps(results_dir):
    """swap_interval > logging interval must still produce all samples
    (round-1 bug: sample count was silently divided by the swap cadence)."""
    out = _run(
        results_dir,
        custom={
            "mcmc": {
                "steps": 200, "samples": 10,
                "warmup": {"warmup_steps": 10, "warmup_chains": 2},
                "mc3": {"activate": True, "chains": 2, "swap_interval": 50,
                        "temperature_diff": 0.2},
            }
        },
        name="mc3cadence",
    )
    n_rows = len((out / "clusters_K1_0.txt").read_text().splitlines())
    assert n_rows == 10, f"expected 10 samples, got {n_rows}"
    from sbayes_tpu.results.results import Results

    res = Results.from_csv_files(out / "clusters_K1_0.txt", out / "stats_K1_0.txt", burn_in=0.0)
    assert list(res.sample_id) == list(range(20, 201, 20))


def test_mc3_run(results_dir):
    out = _run(
        results_dir,
        custom={
            "mcmc": {
                "steps": 200,
                "samples": 10,
                "warmup": {"warmup_steps": 20, "warmup_chains": 2},
                "mc3": {"activate": True, "chains": 3, "swap_interval": 20,
                        "temperature_diff": 0.2},
            }
        },
        name="mc3",
    )
    assert (out / "stats_K1_0.txt").exists()
    assert (out / "hot_chains" / "stats_K1_0.chain1.txt").exists()
    swap_matrix = out / "mc3_swaps_K1_0.txt"
    assert swap_matrix.exists()
    m = np.loadtxt(swap_matrix)
    assert m.shape == (3, 3)


def test_packed_source_cli_run(results_dir, monkeypatch):
    """Full CLI run with the packed int8 source layout forced on: all
    results files appear and the logged one-hot views stay well-formed
    (the loggers consume the unpacked (N, F, C) view regardless of the
    state layout)."""
    monkeypatch.setenv("SBAYES_TPU_SOURCE_DTYPE", "idx")
    out = _run(results_dir, custom={"mcmc": {"steps": 60, "samples": 3}},
               name="packedcli")
    for stem in ("stats", "clusters", "operator_stats"):
        assert (out / f"{stem}_K1_0.txt").exists()
    import pickle

    # Checkpoints store the layout-independent one-hot view (SampleRecord
    # unpacks; resume re-packs via runner._load_state_pickle), so a
    # packed-runtime checkpoint stays portable to bool-runtime resumes.
    with open(out / "state_K1_0.pickle", "rb") as f:
        d = pickle.load(f)
    assert d["source"].dtype == np.bool_ and d["source"].ndim == 3


def test_mc3_swap_matrix_saved_only_on_new_attempts(results_dir):
    """The swap-matrix file appears exactly when swap attempts happened
    (reference cadence: mcmc_setup.py:331-335). The round-4 guard compared
    attempts against ACCEPTS, defeating its own save-only-on-new-swaps
    purpose — with swap_interval beyond the run length no attempts occur
    and no file must be written (test_mc3_run covers the positive case)."""
    out = _run(
        results_dir,
        custom={
            "mcmc": {
                "steps": 100, "samples": 5,
                "warmup": {"warmup_steps": 10, "warmup_chains": 2},
                "mc3": {"activate": True, "chains": 2, "swap_interval": 1000,
                        "temperature_diff": 0.2},
            }
        },
        name="mc3noswaps",
    )
    assert (out / "stats_K1_0.txt").exists()
    assert not (out / "mc3_swaps_K1_0.txt").exists()


def test_carried_refresh_in_sampling_loops(results_dir, monkeypatch):
    """With the refresh cadence forced to every chunk, the single-chain and
    MC3 loops run the exact carried-invariant recompute
    (runner._refresh_states_jit) each sample and still produce clean
    results — guards the refresh wiring itself."""
    import sbayes_tpu.sampling.runner as runner_mod

    monkeypatch.setattr(runner_mod, "REFRESH_EVERY_CHUNKS", 1)
    out = _run(results_dir, custom={"mcmc": {"steps": 60, "samples": 6}},
               name="refresh")
    assert (out / "stats_K1_0.txt").exists()
    out2 = _run(results_dir, custom={
        "mcmc": {
            "steps": 60, "samples": 6,
            "warmup": {"warmup_steps": 10, "warmup_chains": 2},
            "mc3": {"activate": True, "chains": 2, "swap_interval": 10},
        }
    }, name="refresh_mc3")
    assert (out2 / "stats_K1_0.txt").exists()
