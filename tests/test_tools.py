"""Tests of the auxiliary tools (reference test model: golden files +
round trips; test/test_extract_feature_states.py)."""
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


pytestmark = pytest.mark.smoke

FIXTURES = Path(__file__).parent / "fixtures"


def test_extract_feature_states_golden(tmp_path):
    from sbayes_tpu.tools.extract_feature_states import extract

    out = tmp_path / "feature_states.csv"
    extract([FIXTURES / "features.csv"], out)
    df = pd.read_csv(out)
    assert list(df.columns) == ["F1", "F2"]
    assert df["F1"].dropna().tolist() == ["A", "B", "C"]
    assert df["F2"].dropna().tolist() == ["X", "Y"]


def test_extract_universal_prior_counts(tmp_path):
    from sbayes_tpu.tools.extract_prior_counts import extract_universal

    out = tmp_path / "universal.json"
    extract_universal(FIXTURES / "features.csv", FIXTURES / "feature_states.csv", out)
    d = json.loads(out.read_text())
    # F1: A appears 2x, B 2x, C 1x; +1 hyper-prior concentration
    assert d["F1"] == {"A": 3.0, "B": 3.0, "C": 2.0}
    # F2 has one NA: X 2x, Y 2x
    assert d["F2"] == {"X": 3.0, "Y": 3.0}


def test_extract_inheritance_prior_counts(tmp_path):
    from sbayes_tpu.tools.extract_prior_counts import extract_inheritance

    extract_inheritance(FIXTURES / "features.csv", FIXTURES / "feature_states.csv", tmp_path)
    famA = json.loads((tmp_path / "famA.json").read_text())
    assert famA["F1"] == {"A": 2.0, "B": 2.0, "C": 1.0}


def test_convert_prior_csv_to_json(tmp_path):
    from sbayes_tpu.tools.convert_prior_csv_to_json import convert

    csv = tmp_path / "prior.csv"
    csv.write_text("feature,A,B,C\nF1,1.5,2.5,\nF2,3.0,4.0,5.0\n")
    out = tmp_path / "prior.json"
    convert(csv, out)
    d = json.loads(out.read_text())
    assert d["F1"] == {"A": 1.5, "B": 2.5}
    assert d["F2"] == {"A": 3.0, "B": 4.0, "C": 5.0}


def test_subsample(tmp_path):
    from sbayes_tpu.tools.subsample import subsample_file

    stats = tmp_path / "stats_K1_0.txt"
    stats.write_text("header\n" + "\n".join(str(i) for i in range(10)) + "\n")
    out = subsample_file(stats, 2)
    lines = out.read_text().splitlines()
    assert lines[0] == "header"
    assert lines[1:] == ["0", "2", "4", "6", "8"]


def test_psis_loo_sane():
    """PSIS-LOO on iid normal log-likelihoods approximates the analytic lppd."""
    from sbayes_tpu.tools.psis import psis_loo

    rng = np.random.default_rng(0)
    S, n = 2000, 20
    # model: x ~ N(mu, 1), posterior samples of mu near 0
    mu = rng.normal(0, 0.1, size=(S, 1))
    x = rng.normal(0, 1.0, size=(1, n))
    log_lik = -0.5 * np.log(2 * np.pi) - 0.5 * (x - mu) ** 2
    elpd, elpd_i, khats = psis_loo(log_lik)
    assert np.isfinite(elpd)
    assert np.all(khats < 0.7)  # well-behaved weights
    # should be close to the true expected log predictive density
    expected = np.sum(-0.5 * np.log(2 * np.pi) - 0.5 * x**2)
    assert abs(elpd - expected) < 5.0


def test_align_clusters_roundtrip(tmp_path):
    from sbayes_tpu.tools.align_clusters import (
        align_two_runs,
        realign_within_run,
        write_clusters,
        load_clusters,
    )
    from sbayes_tpu.results.results import Results

    # Build two fake runs: run2 = run1 with permuted labels
    rng = np.random.default_rng(1)
    n_samples, K, N = 30, 3, 8
    clusters1 = rng.random((K, n_samples, N)) < 0.3

    cols = ["Sample", "posterior", "likelihood", "prior"]
    cols += [f"size_a{i}" for i in range(K)]
    cols += ["w_areal_f1", "w_universal_f1"]
    cols += [f"areal_a{i}_f1_s{j}" for i in range(K) for j in range(2)]
    cols += ["universal_<ALL>_f1_s0", "universal_<ALL>_f1_s1"]
    params1 = pd.DataFrame(
        rng.random((n_samples, len(cols))), columns=cols
    )
    params1["Sample"] = np.arange(n_samples)
    for i in range(K):
        params1[f"size_a{i}"] = clusters1[i].sum(-1)

    perm = np.array([2, 0, 1])
    clusters2 = clusters1[perm]
    params2 = params1.copy()
    for i, j in enumerate(perm):
        params2[f"size_a{i}"] = params1[f"size_a{j}"]
        for jj in range(2):
            params2[f"areal_a{i}_f1_s{jj}"] = params1[f"areal_a{j}_f1_s{jj}"]

    r1 = Results(clusters1, params1, burn_in=0)
    r2 = Results(clusters2, params2, burn_in=0)
    aligned_clusters, aligned_params = align_two_runs(r1, r2)
    # aligned run-2 clusters should match run 1 again
    np.testing.assert_array_equal(aligned_clusters.transpose((1, 0, 2)), clusters1)
    for i in range(K):
        np.testing.assert_allclose(
            aligned_params[f"size_a{i}"].to_numpy(), params1[f"size_a{i}"].to_numpy()
        )

    # bitstring write/read round trip
    path = tmp_path / "clusters.txt"
    write_clusters(path, clusters1.transpose((1, 0, 2)))
    loaded = load_clusters(path)
    np.testing.assert_array_equal(loaded.transpose((1, 0, 2)).astype(bool), clusters1)


def test_guess_feature_types(tmp_path):
    from sbayes_tpu.tools.guess_feature_types import main

    out = tmp_path / "types.csv"
    main(["--input", str(FIXTURES / "features.csv"), "--output", str(out)])
    df = pd.read_csv(out).set_index("feature")
    assert df.loc["F1", "guessed_type"] == "categorical"
    assert df.loc["F2", "guessed_type"] == "binary"
    assert df.loc["F2", "n_na"] == 1


def test_simulation_roundtrip(tmp_path):
    """Simulate a dataset, then load it through the analysis data pipeline
    (covers the reference's simulation -> analysis integration path)."""
    from sbayes_tpu.simulation import main as sim_main

    # canvas: 12 sites, 2 clusters, one confounder
    rows = ["id,x,y,cluster,age"]
    rng = np.random.default_rng(0)
    for i in range(12):
        cl = 1 if i < 4 else (2 if i < 8 else 0)
        age = "old" if i % 2 == 0 else "young"
        rows.append(f"s{i},{rng.uniform(0, 10):.2f},{rng.uniform(0, 10):.2f},{cl},{age}")
    canvas = tmp_path / "canvas.csv"
    canvas.write_text("\n".join(rows) + "\n")

    cfg = {
        "canvas": str(canvas),
        "results": {"path": str(tmp_path / "sim")},
        "n_features": 10,
        "n_states": {"2": 0.5, "3": 0.5},
        "cluster_effect": {"intensity": 1.0, "concentration": 0.5},
        "confounding_effects": {"age": {"intensity": 1.0, "concentration": 0.5}},
        "seed": 42,
    }
    cfg_path = tmp_path / "sim_config.json"
    cfg_path.write_text(json.dumps(cfg))
    sim_main(cfg_path)

    feat_csv = tmp_path / "sim" / "simulated_features.csv"
    states_csv = tmp_path / "sim" / "simulated_feature_states.csv"
    assert feat_csv.exists() and states_csv.exists()

    # loadable by the analysis pipeline
    from sbayes_tpu.data.loader import read_features_from_csv

    objects, features, confounders = read_features_from_csv(
        feat_csv, states_csv, confounder_names=["age"]
    )
    assert features.n_objects == 12
    assert features.n_features == 10
    assert confounders["age"].n_groups == 2
