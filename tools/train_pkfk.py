"""Train the PK-FK classifier head on the repo's TPC-H testdata against
the public TPC-H foreign-key groundtruth, and freeze the weights to
kgfarm_spark/functions/pkfk_weights.json.

Mirrors the reference's classifier lifecycle
(kg_augmentor/pkfk_classification/primary_key_foreign_key_classifier.py:
features from labeled pairs → train → persist → gate join discovery)
without copying its model or data: groundtruth is the TPC-H spec, data
is the driver-generated synthetic testdata, the model is a deterministic
numpy logistic regression.

Usage: python tools/train_pkfk.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgfarm_spark.functions.pkfk_model import (  # noqa: E402
    FEATURES,
    TPCH_FK_GROUNDTRUTH,
    pkfk_candidate_features,
    train_pkfk_logreg,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kgfarm_spark", "functions", "pkfk_weights.json",
)

TPCH_TABLES = "region nation customer supplier part orders lineitem".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from kgfarm_spark.session import get_spark

    spark = get_spark(app_name="train_pkfk", master="local[8]", shuffle_partitions=8)
    tables = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TPCH_TABLES}
    feats = pkfk_candidate_features(spark, tables).collect()
    gt = set(TPCH_FK_GROUNDTRUTH)
    X = [[float(r[f]) for f in FEATURES] for r in feats]
    y = [1.0 if (r["pk_table"], r["pk_col"], r["fk_table"], r["fk_col"]) in gt else 0.0
         for r in feats]
    n_pos = int(sum(y))
    w, b, mu, sd, acc = train_pkfk_logreg(X, y)
    pos_recall = sum(
        1 for xi, yi in zip(X, y)
        if yi == 1.0 and (sum(wi * (v - m) / s for wi, v, m, s in zip(w, xi, mu, sd)) + b) > 0
    ) / max(n_pos, 1)
    print(f"pairs={len(y)} positives={n_pos} train_acc={acc:.3f} pos_recall={pos_recall:.3f}")
    rec = {
        "note": (
            "Binary logistic regression over the 6 pkfk_features, trained on "
            "TPC-H spec groundtruth over the repo's synthetic testdata "
            "(tools/train_pkfk.py) — public stand-in for the reference's "
            "RF/SVM classifiers, same lifecycle."
        ),
        "features": FEATURES,
        "sf_dir": sf_dir,
        "w": [round(float(v), 8) for v in w],
        "b": round(float(b), 8),
        "mu": [round(float(v), 8) for v in mu],
        "sd": [round(float(v), 8) for v in sd],
        "train_acc": round(acc, 4),
        "n_pairs": len(y),
        "n_positive": n_pos,
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
