"""Convert evaluation.yaml metric dumps to CSV (reference misc/yaml2csv.py)."""

from __future__ import annotations

import argparse
import os

import pandas as pd
import yaml


def main(args):
    filename = os.path.join(args.output_dir, "evaluation.yaml")
    with open(filename) as f:
        results = yaml.safe_load(f)
    rows = []
    for metric, mouse_values in results.items():
        for mouse_id, value in mouse_values.items():
            rows.append({"metric": metric, "mouse": mouse_id, "value": value})
    df = pd.DataFrame(rows)
    out = os.path.join(args.output_dir, "evaluation.csv")
    df.to_csv(out, index=False)
    print(f"Saved {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, required=True)
    main(parser.parse_args())
