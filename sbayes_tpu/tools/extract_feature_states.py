"""Extract the set of observed states per feature from data CSV files.

Counterpart of the reference tool (sbayes/tools/extract_feature_states.py):
collects unique (unicode-normalized) states per feature across one or more
data files, orders them alphabetically, and writes a feature_states CSV.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from sbayes_tpu.utils import normalize_str, read_data_csv

ORDER_STATES = True
METADATA_COLUMNS = ["id", "name", "family", "x", "y"]


def collect_feature_states(features_path) -> dict:
    features = read_data_csv(features_path)
    for column in METADATA_COLUMNS:
        if column not in features.columns:
            raise ValueError(f"Required column '{column}' missing in file {features_path}.")
    features = features.drop(METADATA_COLUMNS, axis=1).map(normalize_str)
    return {f: set(features[f].dropna().unique()) for f in features.columns}


def dict_to_df(d: dict) -> pd.DataFrame:
    n_rows = max(len(values) for values in d.values())
    return pd.DataFrame(
        {k: list(values) + [None] * (n_rows - len(values)) for k, values in d.items()}
    )


def extract(csv_paths, output_path):
    feature_states = None
    for path in csv_paths:
        new_fs = collect_feature_states(path)
        if feature_states is None:
            feature_states = new_fs
        else:
            if set(feature_states.keys()) != set(new_fs.keys()):
                raise ValueError(
                    "Features do not match between the input files:\n"
                    f"\tmissing in {path}: {sorted(set(feature_states) - set(new_fs))}\n"
                    f"\tonly in {path}: {sorted(set(new_fs) - set(feature_states))}"
                )
            for f in feature_states:
                feature_states[f].update(new_fs[f])

    if ORDER_STATES:
        feature_states = {f: sorted(v) for f, v in feature_states.items()}

    dict_to_df(feature_states).to_csv(output_path, index=False)


def main(args=None):
    parser = argparse.ArgumentParser(description="Extract feature states from data files.")
    parser.add_argument("--input", nargs="*", type=Path, required=True, help="The input CSV files")
    parser.add_argument("--output", nargs="?", type=Path, required=True, help="The output CSV file")
    ns = parser.parse_args(args)
    extract(ns.input, ns.output)


if __name__ == "__main__":
    main()
