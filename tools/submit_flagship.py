"""spark-submit entrypoint for the flagship backfill + as-of job
(north_rule: "submitted with spark-submit --py-files to multi-executor
clusters at N and 4N executors").

Package and submit:

    cd /root/repo && zip -qr /tmp/kgfarm_spark.zip kgfarm_spark
    spark-submit --py-files /tmp/kgfarm_spark.zip \
        tools/submit_flagship.py \
        --transcripts <path-or-iceberg-table> \
        --probes <path> --out <path> \
        [--tolerance "1 DAY"] [--checkpoint-dir <dir> --buckets 64]

In the sandbox (no cluster) the same file runs under plain python with
--master local[N]. With --checkpoint-dir the run is resumable: completed
conv_id buckets are recorded in a lineage manifest (bucket id, rows,
feature-hash) and skipped on re-run (plans/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain-python fallback; under spark-submit the --py-files zip provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--probes", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tolerance", default="1 DAY")
    ap.add_argument("--master", default=None, help="local[N] for sandbox runs")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument(
        "--hot-conv-turns", type=int, default=None,
        help="straggler guard: conversations with at least this many turns "
        "take the exact bucket+carry decomposition (BENCH.md §2c crossover: "
        "engage when one conversation's row share exceeds ~1/total cores)",
    )
    ap.add_argument("--hot-buckets", type=int, default=32)
    args = ap.parse_args()

    from kgfarm_spark.operators.backfill import backfill_asof_fused
    from kgfarm_spark.session import get_spark

    spark = get_spark(
        app_name="kgfarm_flagship",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        # UI on → per-stage metrics via the REST API (plans/metrics.py)
        extra_conf={"spark.ui.enabled": "true"},
    )

    def read(path: str):
        if "/" not in path:  # catalog table name → Iceberg/metastore table
            return spark.read.table(path)
        return spark.read.parquet(path)

    t0 = time.monotonic()
    transcripts = read(args.transcripts)
    probes = read(args.probes)

    if args.checkpoint_dir:
        from pyspark.sql import functions as F

        from kgfarm_spark.plans.lineage import (
            bucket_of,
            input_snapshot_id,
            run_checkpointed,
        )

        def build_job(probe_bucket, b):
            # co-bucket the transcript side on the same conv_id hash so
            # each bucket job touches only its conversations
            t_bucket = transcripts.filter(bucket_of("conv_id", args.buckets) == b)
            return backfill_asof_fused(
                t_bucket, probe_bucket, tolerance=args.tolerance,
                hot_conv_turns=args.hot_conv_turns, n_hot_buckets=args.hot_buckets,
            )

        written = run_checkpointed(
            build_job, probes, key_col="conv_id", out_dir=args.out,
            n_buckets=args.buckets,
            snapshot_id=input_snapshot_id(transcripts),
        )
        stats = {"buckets_run": len(written)}
    else:
        from kgfarm_spark.plans.metrics import StageMetrics

        job = backfill_asof_fused(
            transcripts, probes, tolerance=args.tolerance,
            hot_conv_turns=args.hot_conv_turns, n_hot_buckets=args.hot_buckets,
        )
        with StageMetrics(spark) as m:
            job.write.mode("overwrite").parquet(args.out)
        stats = {"stage_metrics": m.summary(), "stages": m.stages}

    n_turns = transcripts.count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "job": "flagship_backfill_asof",
                "turns": n_turns,
                "sec": round(dt, 3),
                "turns_per_sec": round(n_turns / dt, 1),
                **({"checkpoint": stats} if "buckets_run" in stats else stats),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
