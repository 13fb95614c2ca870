"""Optimization-round measurement harness (bench.py is FROZEN — this file
holds the extra instrumentation the optimization guide §1 asks for:
noop-sink isolation per query, .explain("formatted") capture, and
per-query min-of-N timing with job descriptions for UI mapping).

Usage:
  python bench_extra.py                      # time all headline queries
  python bench_extra.py --explain [tag]      # dump plans/r07/<q>_<tag>.txt
  python bench_extra.py --only q1,q2         # subset
  python bench_extra.py --runs N             # default 3

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS (default 32) exactly like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "flagship_backfill_asof",
    "asof_backward_latest",
    "asof_interval_all",
    "backfill_features",
    "sessionize",
    "rolling_aggregates",
    "dedup_minhash_lsh",
    "cosine_topk",
    "text_quality",
]


def main() -> None:
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.entry_queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    explain = "--explain" in args
    tag = "before"
    if explain:
        i = args.index("--explain")
        if i + 1 < len(args) and not args[i + 1].startswith("--"):
            tag = args[i + 1]
    names = list(HEADLINE)
    if "--only" in args:
        names = args[args.index("--only") + 1].split(",")
    runs = 3
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    spark = get_spark(
        app_name="kgfarm_bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    if explain:
        os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r07", f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.stop()
        return

    # warm the JVM + parquet footer cache (same as bench.run_once)
    QUERIES[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir, "cpus": cpus, "runs": runs,
        "loadavg": list(os.getloadavg()),
        "min": {n: min(v) for n, v in timings.items()},
        "samples": timings,
        "total_min": round(sum(min(v) for v in timings.values()), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
