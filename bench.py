"""Benchmark harness (driver contract).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "turns_per_sec": ...}

--scaling: sandbox proxy for the north_rule's N vs 4N executor criterion —
generate a deterministic multi-million-turn transcripts table once (so the
job is compute-bound, not overhead-bound), run the SAME fused flagship
job (single-shuffle backfill → as-of resolve) at two parallelism levels
per pair (default pairs 1v4 AND 2v8 — see the effective-core note in
main) in fresh subprocesses, and report throughput at each level plus
per-pair scaling efficiency.

Each query is forced with a noop-format write (full computation, no
driver-side collect — measures the distributed plan, not toPandas).
"""

from __future__ import annotations

import json
import os
import subprocess
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
    # training-data pipeline ops (task-brief additions)
    "dedup_minhash_lsh",
    "cosine_topk",
    "text_quality",
]

SCALE_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "16000000"))
SCALE_DIR = os.path.join(REPO, ".bench", f"transcripts_{SCALE_TURNS}")

SKEW_TURNS = int(os.environ.get("SPARK_GRAFT_SKEW_TURNS", "8000000"))
SKEW_DIR = os.path.join(REPO, ".bench", f"transcripts_skew_{SKEW_TURNS}")

STREAM_TURNS = int(os.environ.get("SPARK_GRAFT_STREAM_TURNS", "8000000"))
STREAM_DIR = os.path.join(REPO, ".bench", f"stream_{STREAM_TURNS}")


def run_once(sf_dir: str, cpus: int, names: list[str], n_runs: int = 3) -> dict:
    """Per-query MIN over ``n_runs`` measured runs (VERDICT r02 next-step
    #7: single-shot timings moved ~18% round-to-round on byte-identical
    operator code — sandbox load noise; min-of-3 is the stable statistic
    for a plan's cost)."""
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.entry_queries import QUERIES
    from kgfarm_spark.sources.transcripts import load_table

    spark = get_spark(
        app_name="kgfarm_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    n_turns = load_table(spark, sf_dir, "events").count()

    # warm the JVM + parquet footer cache once so timings measure the plans
    QUERIES[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def calibrate() -> float:
        """Fixed-cost calibration job (VERDICT r05 #7): a constant
        CPU-bound JVM aggregate with NO engine code and NO I/O — its
        wall time moves only with box load, so a future cross-round
        suite comparison can be load-normalized (the r04 '+26%' false
        alarm cost a round of attention)."""
        from pyspark.sql import functions as F

        t0 = time.monotonic()
        # avg, not sum: summing 200M random 64-bit hashes overflows long
        # under ANSI mode (avg accumulates in double — same work)
        spark.range(0, 200_000_000, 1, cpus).select(
            F.avg(F.xxhash64("id"))
        ).collect()
        return round(time.monotonic() - t0, 3)

    timings: dict[str, float] = {name: float("inf") for name in names}
    calib = float("inf")
    for _ in range(n_runs):
        calib = min(calib, calibrate())
        for name in names:
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = min(timings[name], round(time.monotonic() - t0, 3))
    spark.stop()
    return {
        "timings": timings,
        "n_turns": n_turns,
        "n_runs": n_runs,
        "calibration_sec": calib,
    }


def run_scale_subprocess(flag: str, level: int) -> dict:
    """Run `bench.py <flag> <level>` in a fresh subprocess and parse its
    one-line JSON result — the shared step of every 1-vs-4 scaling pair.
    Raises with the child's stderr tail on crash instead of a bare
    IndexError that used to hide it."""
    r = subprocess.run(
        [sys.executable, __file__, flag, str(level)],
        capture_output=True, text=True, env=dict(os.environ),
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"scaling subprocess {flag} {level} produced no JSON "
            f"(exit {r.returncode}); stderr tail: {r.stderr[-800:]}"
        )
    return json.loads(lines[-1])


def ensure_scale_data() -> None:
    if os.path.exists(os.path.join(SCALE_DIR, "_SUCCESS")):
        return
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_transcripts

    spark = get_spark(app_name="kgfarm_bench_gen", master="local[32]")
    gen_transcripts(spark, n_turns=SCALE_TURNS, n_convs=SCALE_TURNS // 400).write.mode(
        "overwrite"
    ).parquet(SCALE_DIR)
    spark.stop()


def run_scale_job(cpus: int) -> dict:
    """The flagship job (backfill → backward as-of join of probes) on the
    generated table — same input at every parallelism level."""
    from kgfarm_spark.operators.backfill import backfill_asof_fused
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_probes

    # AQE's stage-materialization + replan barriers are a FIXED ~2-3 s cost
    # that swamps sub-minute sandbox jobs (it pays for itself at real scale
    # via skew-splitting); disable it here so the measurement reflects the
    # job's parallel fraction, not the replanner's constant.
    spark = get_spark(
        app_name=f"kgfarm_scale_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    t = spark.read.parquet(SCALE_DIR)
    n = t.count()
    probes = gen_probes(spark, t)
    job = backfill_asof_fused(t, probes, tolerance="1 DAY")
    # warm-up runs (JVM JIT + file footers), then median of 3 measured runs
    job.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        job.write.format("noop").mode("overwrite").save()
        runs.append(time.monotonic() - t0)
    dt = min(runs)
    spark.stop()
    return {"cpus": cpus, "sec": round(dt, 3), "runs": [round(x, 3) for x in runs], "turns": n}


def ensure_skew_data() -> None:
    """Zipf-hot transcripts, two severities: 'moderate' (skew=3.0 → the
    hottest conversation holds ≈4.6% of ALL rows — the north_rule's 1-5%
    scenario) and 'pathological' (skew=6.6 → ≈25%, where the straggler
    binds wall time even at 8 cores; on a 1000-executor cluster the
    crossover is hot_share ≈ 1/n_cores ≈ 0.1%)."""
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_transcripts

    todo = [
        (SKEW_DIR, 3.0),
        (SKEW_DIR + "_patho", 6.6),
    ]
    todo = [(d, s) for d, s in todo if not os.path.exists(os.path.join(d, "_SUCCESS"))]
    if not todo:
        return
    spark = get_spark(app_name="kgfarm_skew_gen", master="local[32]")
    for d, s in todo:
        gen_transcripts(
            spark, n_turns=SKEW_TURNS, n_convs=10_000, seed=42, skew=s
        ).write.mode("overwrite").parquet(d)
    spark.stop()


def _measure_straggler(job_df, spark, runs: int = 2) -> dict:
    """Wall time + PER-STAGE task summaries. The headline straggler number
    is ``window_stage_max_task_ms`` — the slowest task of the stage that
    READS the big shuffle (the window/join stage a skewed key serializes).
    The whole-job ``max_task_ms`` is also reported but is usually the
    SCAN stage's slowest task in this sandbox, which parallelizes with
    input splits at cluster scale and says nothing about key skew
    (VERDICT r03 'Wrong #2': the §2c table's numbers must be reproducible
    from the emitted JSON, so every stage row travels). Min over ``runs``
    by wall time."""
    from kgfarm_spark.plans.metrics import StageMetrics

    job_df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(runs):
        with StageMetrics(spark, task_summaries=True) as m:
            t0 = time.monotonic()
            job_df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
        s = m.summary()
        stages = [
            {
                "stageId": st.get("stageId"),
                "name": (st.get("name") or "").split("\n")[0][:80],
                "numTasks": st.get("numTasks"),
                "medianTaskMs": st.get("medianTaskMs"),
                "maxTaskMs": st.get("maxTaskMs"),
                "inputMb": round((st.get("inputBytes") or 0) / 1e6, 1),
                "shuffleReadMb": round((st.get("shuffleReadBytes") or 0) / 1e6, 1),
                "shuffleWriteMb": round((st.get("shuffleWriteBytes") or 0) / 1e6, 1),
            }
            for st in m.stages
        ]
        shuffle_readers = [st for st in stages if st["shuffleReadMb"] > 0]
        window_stage = (
            max(shuffle_readers, key=lambda st: st["shuffleReadMb"])
            if shuffle_readers
            else None
        )
        rec = {
            "sec": round(dt, 3),
            "max_task_ms": s.get("max_task_ms"),
            "window_stage_max_task_ms": window_stage and window_stage["maxTaskMs"],
            "window_stage_median_task_ms": window_stage and window_stage["medianTaskMs"],
            "window_stage_id": window_stage and window_stage["stageId"],
            "n_tasks": s.get("n_tasks"),
            "shuffle_read_mb": round(s.get("shuffle_read_bytes", 0) / 1e6, 1),
            "stages": stages,
        }
        if best is None or rec["sec"] < best["sec"]:
            best = rec
    return best


def run_skew_bench() -> dict:
    """Straggler bench on the Zipf-hot table (VERDICT r02 next-step #1):
    flagship plain vs hot-conversation guard, and per-conv dim join plain
    vs hybrid_skew_join vs AQE skew-join. autoBroadcastJoinThreshold=-1
    because the scenario being modeled is a 10^9-conversation dim that
    cannot broadcast at 10^12-turn scale; AQE off in the first session so
    the measurement isolates the PLANNED skew handling (AQE's runtime
    skew-split is measured separately as its own baseline)."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.backfill import backfill_asof_fused
    from kgfarm_spark.operators.skew import detect_hot_keys, hybrid_skew_join
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_probes

    ensure_skew_data()
    out: dict = {"metric": "zipf-skew straggler bench (local[8], 64 shuffle partitions)"}
    conf = {
        "spark.ui.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    spark = get_spark(
        app_name="kgfarm_skew", master="local[8]", shuffle_partitions=64, extra_conf=conf
    )
    for label, d in (("moderate", SKEW_DIR), ("pathological", SKEW_DIR + "_patho")):
        t = spark.read.parquet(d)
        n = t.count()
        top = t.groupBy("conv_id").count().orderBy(F.desc("count")).first()
        rec = {
            "turns": n,
            "hottest_conv_rows": top["count"],
            "hot_share": round(top["count"] / n, 4),
        }
        probes = gen_probes(spark, t)
        rec["flagship_plain"] = _measure_straggler(
            backfill_asof_fused(t, probes, tolerance="1 DAY"), spark
        )
        rec["flagship_hot_guard"] = _measure_straggler(
            backfill_asof_fused(
                t, probes, tolerance="1 DAY", hot_conv_turns=100_000, n_hot_buckets=32
            ),
            spark,
        )
        out[label] = rec

    t = spark.read.parquet(SKEW_DIR)
    dim_dir = SKEW_DIR + "_dim"
    if not os.path.exists(os.path.join(dim_dir, "_SUCCESS")):
        t.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("conv_turns"), F.min("role").alias("first_role")
        ).write.mode("overwrite").parquet(dim_dir)
    dim = spark.read.parquet(dim_dir)
    big = t.select("conv_id", "turn_idx")
    out["join_plain_noaqe"] = _measure_straggler(big.join(dim, "conv_id"), spark)
    hot = detect_hot_keys(t, "conv_id", ["turn_idx"], threshold_rows=100_000)
    out["join_hybrid"] = _measure_straggler(
        hybrid_skew_join(big, dim, "conv_id", hot, n_salt=8), spark
    )
    spark.stop()

    # AQE runtime skew-split baseline (Spark's own answer to join skew)
    spark = get_spark(
        app_name="kgfarm_skew_aqe",
        master="local[8]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true", "spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    t = spark.read.parquet(SKEW_DIR)
    dim = spark.read.parquet(dim_dir)
    out["join_plain_aqe_skewsplit"] = _measure_straggler(
        t.select("conv_id", "turn_idx").join(dim, "conv_id"), spark
    )
    spark.stop()

    with open(os.path.join(REPO, "BENCH_SKEW.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def run_pipeline_e2e(sf_dir: str, cpus: int) -> dict:
    """Time the §3.3 full-automation chain (enrich → clean → split →
    engineer_features) on the driver tables; per-stage wall seconds come
    from the lineage manifest (pipeline.record)."""
    from pyspark.sql import functions as F

    from kgfarm_spark.pipeline import run_auto_pipeline
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.transcripts import load_table

    spark = get_spark(
        app_name="kgfarm_pipeline_e2e", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").alias("event_timestamp"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").alias("fv_ts"),
        F.col("value").alias("g_value"),
        "event_type",
    )
    t0 = time.monotonic()
    tr, _te, manifest = run_auto_pipeline(
        orders, events, target="o_orderstatus", on="o_custkey",
        entity_ts="event_timestamp", view_ts="fv_ts", freshness_days=10000,
    )
    tr.write.format("noop").mode("overwrite").save()
    total = round(time.monotonic() - t0, 3)
    spark.stop()
    return {
        "sec": total,
        "stages": {s["stage"]: s["sec"] for s in manifest["stages"]},
    }


def run_pipeline_e2e_scale(cpus: int, fit_model: bool = False) -> dict:
    """The §3.3 full-automation chain at the SCALING corpus size (VERDICT
    r03 next-step #8): the generated multi-million-turn transcript table
    is the feature view (numeric: turn_idx, text length; categorical:
    role, tool), its probe frame is the entity side with a deterministic
    binary label. Same chain as run_pipeline_e2e — enrich (as-of) →
    clean → split → engineer_features — with per-stage wall seconds from
    the lineage manifest."""
    from pyspark.sql import functions as F

    from kgfarm_spark.pipeline import run_auto_pipeline
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_probes

    ensure_scale_data()
    spark = get_spark(
        app_name="kgfarm_pipeline_e2e_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    t = spark.read.parquet(SCALE_DIR)
    n = t.count()
    view = t.select(
        "conv_id",
        "ts",
        "turn_idx",
        F.length("text").alias("text_len"),
        "role",
        "tool",
    )
    # with fit_model the label must be LEARNABLE, not hash noise, for the
    # evaluation leg to say anything: same future-tool-call target as the
    # driver query (entry_ml.q_auto_pipeline_model_eval)
    probes = gen_probes(spark, t)
    if fit_model:
        last_tool = (
            t.filter(F.col("tool").isNotNull())
            .groupBy("conv_id")
            .agg(F.max("ts").alias("__ltt"))
        )
        entity = (
            probes.join(last_tool, "conv_id", "left")
            .withColumn(
                "label",
                F.coalesce(F.col("__ltt") > F.col("query_ts"), F.lit(False)).cast("int"),
            )
            .drop("__ltt")
        )
    else:
        entity = probes.withColumn(
            "label", (F.abs(F.xxhash64("probe_id")) % 2).cast("int")
        )
    t0 = time.monotonic()
    tr, _te, manifest = run_auto_pipeline(
        entity, view, target="label", on="conv_id",
        entity_ts="query_ts", view_ts="ts", freshness_days=10000,
        id_cols=["probe_id"], fit_model=fit_model,
    )
    tr.write.format("noop").mode("overwrite").save()
    total = round(time.monotonic() - t0, 3)
    spark.stop()
    out = {
        "turns": n,
        "cpus": cpus,
        "sec": total,
        "stages": {s["stage"]: s["sec"] for s in manifest["stages"]},
    }
    if fit_model:
        out["model"] = manifest["report"]["model"]
    return out


LLM_DOCS = int(os.environ.get("SPARK_GRAFT_LLM_DOCS", "5000000"))
LLM_SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_LLM_SCALE_DOCS", "1000000"))
LLM_VECS = int(os.environ.get("SPARK_GRAFT_LLM_VECS", "1000000"))
DOCS_DIR = os.path.join(REPO, ".bench", f"documents_{LLM_DOCS}")
DOCS_SCALE_DIR = os.path.join(REPO, ".bench", f"documents_{LLM_SCALE_DOCS}")
VECS_DIR = os.path.join(REPO, ".bench", f"embeddings_{LLM_VECS}")

#: scale-bench LSH config: production row size (r=4 → sharp threshold
#: curve) at 8 bands — P(candidate)=0.89 at J=0.7. The full 128/32
#: production preset multiplies signature-agg cost 4× for recall the
#: 0.7-threshold verify step doesn't need at this corpus's dup profile.
LLM_LSH = {"num_hashes": 32, "bands": 8, "portable": False}


def ensure_llm_data() -> None:
    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_documents, gen_embeddings

    todo = [
        d for d in (DOCS_DIR, DOCS_SCALE_DIR, VECS_DIR)
        if not os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    if not todo:
        return
    spark = get_spark(app_name="kgfarm_llm_gen", master="local[32]")
    if DOCS_DIR in todo:
        gen_documents(spark, n_docs=LLM_DOCS).write.mode("overwrite").parquet(DOCS_DIR)
    if DOCS_SCALE_DIR in todo:
        gen_documents(spark, n_docs=LLM_SCALE_DOCS).write.mode("overwrite").parquet(
            DOCS_SCALE_DIR
        )
    if VECS_DIR in todo:
        gen_embeddings(spark, n_vecs=LLM_VECS).write.mode("overwrite").parquet(VECS_DIR)
    spark.stop()


def _llm_dedup_job(spark, docs_dir: str):
    from kgfarm_spark.operators.dedup import minhash_lsh_dedup_pairs

    docs = spark.read.parquet(docs_dir)
    return minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.7, **LLM_LSH
    )


def run_llm_dedup_one(cpus: int) -> dict:
    """One dedup run at a given parallelism on the scaling corpus (for
    the N vs 4N pair; fresh subprocess per level like --scale-one)."""
    import time as _t

    from kgfarm_spark.session import get_spark

    spark = get_spark(
        app_name=f"kgfarm_llm_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    n = spark.read.parquet(DOCS_SCALE_DIR).count()
    t0 = _t.monotonic()
    _llm_dedup_job(spark, DOCS_SCALE_DIR).write.format("noop").mode("overwrite").save()
    dt = _t.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "sec": round(dt, 3), "docs": n}


def _ann_section(spark, out: dict) -> None:
    """Vector-similarity rows of the LLM-family bench: exact two-phase
    top-k, hyperplane-LSH (single- and 4-table), IVF — each with
    recall@10 against the exact two-phase top-10 on a deterministic
    200-query subsample (VERDICT r03 next-step #5). Collecting ≤2k
    (query, neighbor) rows costs the same as the noop sink."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.similarity import (
        cosine_topk_twophase,
        fit_ivf_centroids,
        ivf_topk,
        lsh_topk,
    )

    only = {x for x in (os.environ.get("SPARK_GRAFT_ANN_ONLY") or "").split(",") if x}

    def _want(name: str) -> bool:
        return not only or name in only

    emb = spark.read.parquet(VECS_DIR)
    n_vecs = emb.count()
    q1000 = emb.filter(F.col("vec_id") < 1000).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q200 = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if _want("twophase"):
        t0 = time.monotonic()
        cosine_topk_twophase(emb, q1000, k=10).write.format("noop").mode("overwrite").save()
        out["cosine_topk_twophase"] = {
            "vecs": n_vecs, "queries": 1000, "sec": round(time.monotonic() - t0, 1)
        }

    def _topk_sets(rows):
        s: dict = {}
        for r in rows:
            s.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return s

    def _recall(truth: dict, got: dict) -> float:
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        total = sum(len(truth[q]) for q in truth)
        return round(hits / total, 3)

    truth = _topk_sets(cosine_topk_twophase(emb, q200, k=10).collect())

    if _want("lsh"):
        t0 = time.monotonic()
        lsh_rows = lsh_topk(emb, q200, k=10, n_planes=10).collect()
        out["lsh_topk"] = {
            "vecs": n_vecs, "queries": 200, "n_planes": 10,
            "sec": round(time.monotonic() - t0, 1),
            "recall_at_10": _recall(truth, _topk_sets(lsh_rows)),
        }
        # multi-table recall amplification (L independent tables, union of
        # candidates): the honest answer to single-table recall at 1M
        t0 = time.monotonic()
        lsh4_rows = lsh_topk(emb, q200, k=10, n_planes=10, n_tables=4).collect()
        out["lsh_topk_4tables"] = {
            "vecs": n_vecs, "queries": 200, "n_planes": 10, "n_tables": 4,
            "sec": round(time.monotonic() - t0, 1),
            "recall_at_10": _recall(truth, _topk_sets(lsh4_rows)),
        }
    t0 = time.monotonic()
    cents = fit_ivf_centroids(emb, n_cells=256, id_col="vec_id")
    fit_sec = round(time.monotonic() - t0, 1)
    if _want("ivf"):
        t0 = time.monotonic()
        ivf_rows = ivf_topk(emb, q200, centroids=cents, k=10, nprobe=4).collect()
        out["ivf_topk"] = {
            "vecs": n_vecs, "queries": 200, "n_cells": 256, "nprobe": 4,
            "fit_sec": fit_sec, "search_sec": round(time.monotonic() - t0, 1),
            "recall_at_10": _recall(truth, _topk_sets(ivf_rows)),
        }
    if not _want("pq"):
        return
    # r06: product quantization — the memory path (m uint8 codes + one
    # float norm + one cell id per vector vs full float vectors).
    # RESIDUAL (IVF-PQ) form, reusing the 256-cell coarse quantizer:
    # flat codebooks on this clustered corpus collapse to recall ~0.006
    # (whole cells encode identically), residuals recover it — the exact
    # failure mode Jégou et al. §III motivates.
    from kgfarm_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    t0 = time.monotonic()
    books = fit_pq_codebooks(emb, m=32, ksub=256, centroids=cents)
    pq_fit_sec = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    codes = pq_encode(emb, books, centroids=cents).localCheckpoint(eager=True)
    enc_sec = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    np_rows = pq_topk(
        codes, q200, books, k=10, centroids=cents, nprobe=4
    ).collect()
    nprobe_sec = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    rr_rows = pq_topk(
        codes, q200, books, k=10, centroids=cents, nprobe=4,
        rerank=200, corpus=emb,
    ).collect()
    rr200_sec = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    rr1k_rows = pq_topk(
        codes, q200, books, k=10, centroids=cents, nprobe=4,
        rerank=1000, corpus=emb,
    ).collect()
    out["pq_topk"] = {
        "vecs": n_vecs, "queries": 200, "m": 32, "ksub": 256,
        "ivf_cells": len(cents), "residual": True,
        "fit_sec": pq_fit_sec, "encode_sec": enc_sec,
        "nprobe4_sec": nprobe_sec,
        "nprobe4_recall_at_10": _recall(truth, _topk_sets(np_rows)),
        "nprobe4_rerank200_sec": rr200_sec,
        "nprobe4_rerank200_recall_at_10": _recall(truth, _topk_sets(rr_rows)),
        "nprobe4_rerank1000_sec": round(time.monotonic() - t0, 1),
        "nprobe4_rerank1000_recall_at_10": _recall(truth, _topk_sets(rr1k_rows)),
        "bytes_per_vec": "32 codes + 8B norm + 4B cell = 44B vs 256B float32 raw",
        "note": (
            "this corpus is PQ's adversarial case: cluster center + iid "
            "per-dim jitter, so in-cell ranking is pure noise alignment "
            "and quantization error competes with the entire signal; "
            "flat (non-residual) codebooks measured 0.006 recall, m=16 "
            "residual 0.073 — the m=32 residual + rerank ladder is the "
            "honest operating point (real text/image embeddings have "
            "manifold structure PQ exploits far better)"
        ),
    }


def run_ann_scale() -> dict:
    """Re-measure ONLY the vector rows and merge them into the existing
    BENCH_LLM.json (the dedup rows are minutes-long; this lets an ANN
    change refresh its evidence without re-paying them)."""
    from kgfarm_spark.session import get_spark

    ensure_llm_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out.setdefault("metric", "LLM-data family scale bench (local[8])")
    spark = get_spark(app_name="kgfarm_ann", master="local[8]", shuffle_partitions=64)
    _ann_section(spark, out)
    spark.stop()
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out


def run_corpus_scale() -> dict:
    """Corpus-curation ops at the 5M-doc corpus. Each op is a named
    thunk; results merge into BENCH_LLM.json AFTER EVERY OP (a timeout
    kill keeps the finished numbers). SPARK_GRAFT_CORPUS_ONLY=
    "dsir_importance,bpe_train" re-benches a subset — the full suite now
    exceeds a single sitting."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.bpe import bpe_train, word_census
    from kgfarm_spark.operators.dedup import (
        decontaminate,
        dedup_lines_corpus,
        duplicate_ngram_spans,
    )
    from kgfarm_spark.operators.packing import pack_sequences
    from kgfarm_spark.operators.textstats import (
        ccnet_buckets,
        dsir_importance,
        gopher_line_rules,
        quality_gate,
        unigram_logprob,
    )
    from kgfarm_spark.session import get_spark

    ensure_llm_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    spark = get_spark(app_name="kgfarm_corpus", master="local[8]", shuffle_partitions=64)
    docs = spark.read.parquet(DOCS_DIR)
    n_docs = docs.count()

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _quality_gate() -> dict:
        _noop(quality_gate(docs, "doc_id", "text"))
        return {}

    def _spans() -> dict:
        _noop(duplicate_ngram_spans(docs, "doc_id", "text", n=5, min_docs=2))
        return {"n": 5, "spans": n_docs * 26}

    def _lines() -> dict:
        lined = docs.select(
            "doc_id",
            F.concat(
                F.lit("doc "), (F.col("doc_id") % 7).cast("string"),
                F.lit(" header\n"), F.col("text"),
                F.lit("\nsubscribe to our newsletter for weekly updates"),
            ).alias("text"),
        )
        _noop(dedup_lines_corpus(lined, "doc_id", "text"))
        return {"lines": n_docs * 3}

    def _unigram() -> dict:
        _noop(unigram_logprob(docs, "doc_id", "text"))
        return {}

    def _pack() -> dict:
        toks = docs.select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens")
        )
        _noop(pack_sequences(toks, "doc_id", "n_tokens", budget=2048))
        return {"budget": 2048}

    def _decon() -> dict:
        train = docs.filter(F.col("doc_id") % 1000 != 0)
        evalb = docs.filter(F.col("doc_id") % 1000 == 0)
        flagged = decontaminate(train, evalb, "doc_id", "text", n=5, min_overlap=2)
        return {"eval_docs": n_docs // 1000, "n": 5, "flagged": flagged.count()}

    def _ccnet() -> dict:
        _noop(ccnet_buckets(docs, "doc_id", "text"))
        return {}

    def _bigram() -> dict:
        from kgfarm_spark.operators.textstats import bigram_logprob

        _noop(bigram_logprob(docs, "doc_id", "text"))
        return {}

    def _dsir() -> dict:
        _noop(dsir_importance(docs, (F.col("doc_id") % 10) == 0, "doc_id", "text"))
        return {"target_frac": 0.1}

    def _kn3() -> dict:
        """KN3 runs at the 1M-doc corpus (like semantic dedup): the
        synthetic text is near-random — 26.8M distinct trigrams per 30M
        words — so the trigram TYPE table is corpus-sized here, the
        worst case for the type-join shape. Natural text reuses
        trigrams Zipf-style (types << tokens), where the census-sized
        assumption actually holds."""
        from kgfarm_spark.operators.textstats import kn3_logprob

        d1m = spark.read.parquet(DOCS_SCALE_DIR)
        n1m = d1m.count()
        t0 = time.monotonic()
        _noop(kn3_logprob(d1m, "doc_id", "text"))
        dt = round(time.monotonic() - t0, 1)
        return {
            "order": 3, "discount": 0.75,
            "docs_1m": n1m, "sec_1m": dt,
            "docs_per_sec_1m": round(n1m / dt),
            "note": "benched at 1M (near-random synthetic corpus => "
                    "trigram types ~ tokens; worst case for the type join)",
        }

    def _curate() -> dict:
        """VERDICT r05 #1 evidence: the chained curate() pipeline at the
        full 5M-doc corpus — gopher_filter → exact dedup → LSH near-dedup
        keep-best → decontaminate (0.1% eval split) → CCNet head+middle →
        pack. The per-stage seconds land in the manifest (the stage wall
        IS the measurement — no extra noop needed)."""
        from pyspark.sql import functions as F

        from kgfarm_spark.curation import curate

        train = docs.filter(F.col("doc_id") % 1000 != 0)
        evalb = docs.filter(F.col("doc_id") % 1000 == 0).select("text")
        _, manifest = curate(
            train,
            eval_df=evalb,
            # the synthetic corpus words are 'w12345'-shaped (≈83% digit
            # chars, no English stopwords), so the digit and stopword
            # rules would drop EVERYTHING and the rest of the chain
            # would run on 0 rows; relax those two, keep the rest — the
            # measurement target is the chain's cost, not the verdicts
            gopher_kw={"gate_kw": {"max_digit_ratio": 1.0,
                                   "min_stopword_hits": 0}},
            neardup_kw={"threshold": 0.7},
            decontaminate_kw={"n": 5, "min_overlap": 2},
            pack_budget=2048,
        )
        return {
            "stages": [
                {k: s[k] for k in ("stage", "rows", "dropped", "sec")}
                for s in manifest["stages"]
            ],
            "survival_rate": manifest["survival_rate"],
        }

    def _gopher() -> dict:
        _noop(gopher_line_rules(docs, "doc_id", "text"))
        return {}

    def _bpe() -> dict:
        n_vocab = word_census(docs, "text").count()
        merges, _seg = bpe_train(docs, "text", n_merges=20)
        return {
            "distinct_words": n_vocab, "n_merges": merges.count(),
            "note": "corpus-linear census once, then census-sized merge rounds",
        }

    def _bpe_batched() -> dict:
        """VERDICT r05 #2 evidence: 100 merges, sequential vs exact-batched
        rounds — identical output (pytest-pinned), fewer Spark rounds."""
        rec: dict = {"n_merges": 100}
        for label, mb in (("sequential", 1), ("batched", 16)):
            st: dict = {}
            t0 = time.monotonic()
            bpe_train(docs, "text", n_merges=100, max_batch=mb, stats=st)
            rec[f"{label}_sec"] = round(time.monotonic() - t0, 1)
            rec[f"{label}_rounds"] = st["rounds"]
        rec["speedup"] = round(rec["sequential_sec"] / rec["batched_sec"], 2)
        return rec

    def _bpe_bytes() -> dict:
        """VERDICT r05 #3 evidence: byte-level gpt2-pretokenized train."""
        st: dict = {}
        bpe_train(
            docs, "text", n_merges=50,
            pretokenize="gpt2", alphabet="bytes", stats=st,
        )
        return {"n_merges": 50, "rounds": st["rounds"],
                "pretokenize": "gpt2", "alphabet": "bytes"}

    def _bpe_local() -> dict:
        """r06 evidence: strategy='local' (census-collect + incremental
        pair-index trainer) vs the exact-batched distributed rounds at a
        production-shaped merge count. Output identical (pytest-pinned);
        the merge loop cost drops from per-merge Spark rounds to an
        in-memory loop — wall time becomes census-bound, so vocabulary
        size stops mattering (the 5000-merge row exhausts this corpus's
        pair space and shows the loop is not the bottleneck)."""
        rec: dict = {"n_merges": 500}
        st: dict = {}
        t0 = time.monotonic()
        bpe_train(docs, "text", n_merges=500, max_batch=16, stats=st)
        rec["batched_sec"] = round(time.monotonic() - t0, 1)
        rec["batched_rounds"] = st["rounds"]
        st = {}
        t1 = time.monotonic()
        bpe_train(docs, "text", n_merges=500, strategy="local", stats=st)
        rec["local_sec"] = round(time.monotonic() - t1, 1)
        rec["speedup"] = round(rec["batched_sec"] / rec["local_sec"], 1)
        st = {}
        t2 = time.monotonic()
        bpe_train(docs, "text", n_merges=5000, strategy="local", stats=st)
        rec["local_5000_sec"] = round(time.monotonic() - t2, 1)
        rec["local_5000_merges"] = st["merges"]
        return rec

    def _unigram_tok() -> dict:
        """r06: SentencePiece-style unigram trainer + Viterbi apply at
        the 5M-doc corpus. Train is census-bound (distinct words only);
        apply is the bpe_apply broadcast shape (zero shuffle)."""
        from kgfarm_spark.operators.unigram import unigram_apply, unigram_train

        st: dict = {}
        t0 = time.monotonic()
        pieces = unigram_train(
            docs, "text", vocab_size=8000, max_piece_len=6,
            seed_size=50_000, em_iters=2, strategy="local", stats=st,
        )
        train_sec = round(time.monotonic() - t0, 1)
        t1 = time.monotonic()
        _noop(unigram_apply(docs, pieces, "text", "doc_id", max_piece_len=6))
        apply_sec = round(time.monotonic() - t1, 1)
        return {
            "train_sec": train_sec, "em_passes": st["em_passes"],
            "vocab": st["vocab"], "apply_sec": apply_sec,
            "apply_docs_per_sec": round(n_docs / apply_sec),
        }

    def _gopher_rep_full() -> dict:
        """r06: the complete Table A1 repetition family — the 9-order
        n-gram explode is ~9x the corpus word count through one
        (doc, n, gram) groupBy; the per-row line/paragraph stats ride
        free."""
        from kgfarm_spark.operators.textstats import gopher_repetition_full

        _noop(gopher_repetition_full(docs, "doc_id", "text"))
        return {"orders": "2-10"}

    def _materialize() -> dict:
        """r06: the packing materializer at 5M docs / 150M tokens —
        every token crosses the seq_id shuffle once (the unavoidable
        cost of physically assembling sequences; the layout-only
        pack_sequences row shuffles counts, not tokens)."""
        from kgfarm_spark.operators.packing import materialize_sequences
        from kgfarm_spark.operators.textstats import _words

        toks = docs.select(
            "doc_id", _words(F.coalesce(F.col("text"), F.lit(""))).alias("tokens")
        )
        out = materialize_sequences(toks, "doc_id", "tokens", budget=2048)
        _noop(out)
        return {"budget": 2048}

    def _bpe_apply() -> dict:
        from kgfarm_spark.operators.bpe import bpe_apply

        _, seg = bpe_train(docs, "text", n_merges=20)
        out_rec = {"note": "sec includes the 20-merge re-train; *_sec are tokenize-only"}
        for meth in ("broadcast", "join"):
            t0 = time.monotonic()
            _noop(bpe_apply(docs, seg, "text", "doc_id", method=meth))
            dt = round(time.monotonic() - t0, 1)
            out_rec[f"{meth}_sec"] = dt
            out_rec[f"{meth}_docs_per_sec"] = round(n_docs / dt)
        return out_rec

    def _online() -> dict:
        from kgfarm_spark.streaming.online import (
            fit_curation_model,
            score_with_model,
        )

        t0 = time.monotonic()
        model = fit_curation_model(docs, max_vocab=1_000_000)
        fit_sec = round(time.monotonic() - t0, 1)
        t1 = time.monotonic()
        _noop(
            score_with_model(docs, model).select(
                "doc_id", "n_words", "mean_logprob", "bucket"
            )
        )
        apply_sec = round(time.monotonic() - t1, 1)
        return {
            "fit_sec": fit_sec,
            "apply_sec": apply_sec,
            "apply_docs_per_sec": round(n_docs / apply_sec),
            "vocab": len(model.vocab),
            "note": (
                "apply = stateless Arrow path (zero shuffle); synthetic "
                "corpus vocabulary is small so the broadcast dict is tiny "
                "and lookup hit rate is unrealistically cache-friendly — "
                "read apply_sec as the per-row scoring floor"
            ),
        }

    def _bloom_incremental() -> dict:
        """r06: cross-shard Bloom dedup — the 5M-doc corpus plays the
        history, a derived 2M-doc shard (half verbatim dups, half novel)
        plays the ingest. build = one corpus-linear mapInPandas pass;
        probe+verify = map-side broadcast probe, exact join over
        candidates only (the structural win: join input ∝ dup rate)."""
        from kgfarm_spark.operators.incremental import (
            bloom_fpr,
            build_history_filter,
            dedup_against_history,
        )

        t0 = time.monotonic()
        model = build_history_filter(docs, n_bits=1 << 26, k=6)
        build_sec = round(time.monotonic() - t0, 1)
        shard = docs.filter(F.col("doc_id") % 5 < 2).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.when(F.col("doc_id") % 5 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" novel-"),
                                F.col("doc_id").cast("string")))
            .alias("text"),
        )
        n_shard = shard.count()
        t1 = time.monotonic()
        survivors = dedup_against_history(shard, model, docs)
        n_out = survivors.count()
        probe_sec = round(time.monotonic() - t1, 1)
        return {
            "history_docs": n_docs, "shard_docs": n_shard,
            "survivors": n_out, "build_sec": build_sec,
            "probe_verify_sec": probe_sec,
            "shard_docs_per_sec": round(n_shard / probe_sec),
            "fpr": round(bloom_fpr(model), 6),
            "filter_mb": round((1 << 26) / 8 / 1e6, 1),
        }

    def _quality_classifier() -> dict:
        """r06: the GPT-3 classifier-filtering recipe at 5M docs —
        deterministic full-batch GD fit (two linear shuffles per
        iteration over the checkpointed feature frame), broadcast-join
        scoring, Pareto acceptance."""
        from kgfarm_spark.operators.quality_model import (
            pareto_select,
            quality_classifier_fit,
            quality_classifier_score,
        )

        t0 = time.monotonic()
        model = quality_classifier_fit(
            docs, (F.col("doc_id") % 10) == 0, "doc_id", "text",
            dim=65536, iters=5,
        )
        fit_sec = round(time.monotonic() - t0, 1)
        t1 = time.monotonic()
        scored = quality_classifier_score(docs, model, "doc_id", "text")
        kept = pareto_select(scored, alpha=9.0).count()
        score_sec = round(time.monotonic() - t1, 1)
        return {
            "dim": 65536, "iters": 5, "fit_sec": fit_sec,
            "score_select_sec": score_sec,
            "score_docs_per_sec": round(n_docs / score_sec),
            "kept": kept, "kept_frac": round(kept / n_docs, 4),
            "model_buckets": len(model["weights"]),
        }

    def _wordpiece() -> dict:
        """r06: WordPiece completes the tokenizer triad at 5M docs —
        train is census-local (likelihood-ratio incremental trainer over
        the 100k-word census), apply the broadcast max-munch kernel."""
        from kgfarm_spark.operators.wordpiece import (
            wordpiece_apply,
            wordpiece_train,
        )

        t0 = time.monotonic()
        _, vocab = wordpiece_train(docs, "text", n_merges=500)
        train_sec = round(time.monotonic() - t0, 1)
        t1 = time.monotonic()
        _noop(wordpiece_apply(docs, vocab, "text", "doc_id"))
        apply_sec = round(time.monotonic() - t1, 1)
        return {
            "n_merges": 500, "vocab": vocab.count(),
            "train_sec": train_sec, "apply_sec": apply_sec,
            "apply_docs_per_sec": round(n_docs / apply_sec),
        }

    def _chunk() -> dict:
        """r06: sliding-window chunking at 5M docs — zero-shuffle
        explode; output rows ∝ corpus_words / stride."""
        from kgfarm_spark.operators.packing import chunk_documents

        out_df = chunk_documents(docs, window=24, stride=12)
        _noop(out_df)  # materializes the chunk STRINGS (count would prune them)
        return {"window": 24, "stride": 12, "chunks": out_df.count(),
                "note": "sec is the noop write; the chunks recount is a "
                        "pruned second job (no string assembly)"}

    ops = {
        "quality_gate": _quality_gate,
        "chunk_documents": _chunk,
        "duplicate_ngram_spans": _spans,
        "dedup_lines_corpus": _lines,
        "unigram_logprob": _unigram,
        "bigram_logprob": _bigram,
        "pack_sequences": _pack,
        "decontaminate": _decon,
        "ccnet_buckets": _ccnet,
        "dsir_importance": _dsir,
        "kn3_logprob": _kn3,
        "curation_e2e": _curate,
        "gopher_line_rules": _gopher,
        "bpe_train": _bpe,
        "bpe_train_batched": _bpe_batched,
        "bpe_train_bytes": _bpe_bytes,
        "bpe_train_local": _bpe_local,
        "unigram_tokenizer": _unigram_tok,
        "materialize_sequences": _materialize,
        "gopher_repetition_full": _gopher_rep_full,
        "bpe_apply": _bpe_apply,
        "online_score_frozen": _online,
        "dedup_incremental_bloom": _bloom_incremental,
        "quality_classifier": _quality_classifier,
        "wordpiece_tokenizer": _wordpiece,
    }
    only = {x for x in (os.environ.get("SPARK_GRAFT_CORPUS_ONLY") or "").split(",") if x}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        extra = fn()
        dt = time.monotonic() - t0
        out[name] = {
            "docs": n_docs, "sec": round(dt, 1),
            "docs_per_sec": round(n_docs / dt), **extra,
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    spark.stop()
    return out


def run_cc_scale() -> dict:
    """Dup-cluster resolution at the 1M-doc scaling corpus: MinHash-LSH
    pairs → dedup_components (distributed min-label propagation). Merged
    into BENCH_LLM.json like --ann-scale."""
    from kgfarm_spark.operators.dedup import (
        dedup_components,
        minhash_lsh_dedup_pairs,
    )
    from kgfarm_spark.session import get_spark

    ensure_llm_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    spark = get_spark(app_name="kgfarm_cc", master="local[8]", shuffle_partitions=64)
    docs = spark.read.parquet(DOCS_SCALE_DIR)
    n_docs = docs.count()
    pairs = minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.7, **LLM_LSH
    ).localCheckpoint(eager=True)  # materialize: time CC alone, not pair gen
    n_pairs = pairs.count()
    t0 = time.monotonic()
    comp = dedup_components(pairs)
    n_nodes = comp.count()
    n_comps = comp.select("component").distinct().count()
    dt = time.monotonic() - t0
    out["dedup_components"] = {
        "docs": n_docs, "pairs": n_pairs, "paired_docs": n_nodes,
        "components": n_comps, "sec": round(dt, 1),
    }
    spark.stop()
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out


def run_llm_scale_bench() -> dict:
    """Throughput + scaling evidence for the LLM-data family at ≥5M docs
    / 1M vectors (VERDICT r02 missing #2). Single measured run per row
    (these are minutes-long jobs; the figure of merit is docs/sec order
    of magnitude, not ±5%)."""
    from kgfarm_spark.operators.dedup import simhash64
    from kgfarm_spark.session import get_spark

    ensure_llm_data()
    out: dict = {"metric": "LLM-data family scale bench (local[8])"}
    spark = get_spark(app_name="kgfarm_llm", master="local[8]", shuffle_partitions=64)

    docs = spark.read.parquet(DOCS_DIR)
    n_docs = docs.count()
    t0 = time.monotonic()
    _llm_dedup_job(spark, DOCS_DIR).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["dedup_minhash_lsh"] = {
        "docs": n_docs, "sec": round(dt, 1), "docs_per_sec": round(n_docs / dt),
        "config": LLM_LSH,
    }

    # the LSH_PRODUCTION preset (128 hashes / 32 bands) at the same 5M docs
    # (VERDICT r03 next-step #4): 4× the signature work and 4× the band
    # rows of the 32/8 config, in exchange for the pinned recall curve
    # (tests/test_lsh_recall.py: 0.83/1.00/1.00 at J=0.5/0.7/0.9)
    from kgfarm_spark.operators.dedup import LSH_PRODUCTION, minhash_lsh_dedup_pairs

    t0 = time.monotonic()
    minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.7, **LSH_PRODUCTION
    ).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["dedup_minhash_lsh_production"] = {
        "docs": n_docs, "sec": round(dt, 1), "docs_per_sec": round(n_docs / dt),
        "config": LSH_PRODUCTION,
    }

    t0 = time.monotonic()
    simhash64(docs, "doc_id", "text").write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out["simhash64"] = {
        "docs": n_docs, "sec": round(dt, 1), "docs_per_sec": round(n_docs / dt)
    }

    _ann_section(spark, out)
    spark.stop()

    # dedup pipeline 1v4 scaling pair (fresh subprocess per level)
    pair = {}
    for level in (1, 4):
        pair[level] = run_scale_subprocess("--llm-scale-one", level)
    thr1 = pair[1]["docs"] / pair[1]["sec"]
    thr4 = pair[4]["docs"] / pair[4]["sec"]
    out["dedup_scaling_1v4"] = {
        "docs": pair[1]["docs"],
        "sec_1": pair[1]["sec"], "sec_4": pair[4]["sec"],
        "docs_per_sec_1": round(thr1), "docs_per_sec_4": round(thr4),
        "scaling_efficiency": round((thr4 / thr1) / 4.0, 3),
    }

    with open(os.path.join(REPO, "BENCH_LLM.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def run_tok_scale_one(cpus: int) -> dict:
    """One tokenize→materialize run at a given parallelism over the
    5M-doc corpus (fresh subprocess per level, like --scale-one): the
    r06 sequence-assembly path — whitespace tokens, budget 2048, every
    token through the ONE seq_id shuffle."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.packing import materialize_sequences
    from kgfarm_spark.operators.textstats import _words
    from kgfarm_spark.session import get_spark

    spark = get_spark(
        app_name=f"kgfarm_tok_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    docs = spark.read.parquet(DOCS_DIR)
    n = docs.count()
    toks = docs.select(
        "doc_id", _words(F.coalesce(F.col("text"), F.lit(""))).alias("tokens")
    )
    job = materialize_sequences(toks, "doc_id", "tokens", budget=2048)
    job.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    job.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n, "sec": round(dt, 3)}


def run_tok_scale() -> dict:
    """North-rule pair for the materializer: 1 vs 4 cores, fresh
    subprocess per level, merged into BENCH_LLM.json."""
    ensure_llm_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    pair = {}
    for level in (1, 4):
        pair[level] = run_scale_subprocess("--tok-scale-one", level)
    thr1 = pair[1]["docs"] / pair[1]["sec"]
    thr4 = pair[4]["docs"] / pair[4]["sec"]
    out["materialize_scaling_1v4"] = {
        "docs": pair[1]["docs"],
        "sec_1": pair[1]["sec"], "sec_4": pair[4]["sec"],
        "docs_per_sec_1": round(thr1), "docs_per_sec_4": round(thr4),
        "scaling_efficiency": round((thr4 / thr1) / 4.0, 3),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out["materialize_scaling_1v4"]


def run_convfe_scale_one(cpus: int) -> dict:
    """One preference-pair construction run at a given parallelism over
    the 16M-turn transcript table (fresh subprocess per level, like
    --scale-one): conv-keyed lead window → prompt-keyed max_by/min_by
    aggregate — the representative two-shuffle shape of the conversation
    feature-eng family."""
    from kgfarm_spark.operators.conversations import preference_pairs
    from kgfarm_spark.session import get_spark

    spark = get_spark(
        app_name=f"kgfarm_convfe_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    t = spark.read.parquet(SCALE_DIR)
    n = t.count()
    job = preference_pairs(t)
    job.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.monotonic()
    job.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "turns": n, "sec": round(dt, 3)}


def run_convfe_scaling() -> dict:
    """North-rule pair for the conversation feature family: 1 vs 4
    cores, fresh subprocess per level, merged into BENCH_LLM.json."""
    ensure_scale_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    pair = {}
    for level in (1, 4):
        pair[level] = run_scale_subprocess("--convfe-scale-one", level)
    thr1 = pair[1]["turns"] / pair[1]["sec"]
    thr4 = pair[4]["turns"] / pair[4]["sec"]
    out["convfe_scaling_1v4"] = {
        "turns": pair[1]["turns"],
        "sec_1": pair[1]["sec"], "sec_4": pair[4]["sec"],
        "turns_per_sec_1": round(thr1), "turns_per_sec_4": round(thr4),
        "scaling_efficiency": round((thr4 / thr1) / 4.0, 3),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out["convfe_scaling_1v4"]


def run_bloom_scale_one(cpus: int) -> dict:
    """One Bloom probe+verify run at a given parallelism over the 5M-doc
    history (fresh subprocess per level): filter built once (untimed —
    it is the fit), then the ingest-shard dedup timed."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.incremental import (
        build_history_filter,
        dedup_against_history,
    )
    from kgfarm_spark.session import get_spark

    spark = get_spark(
        app_name=f"kgfarm_bloom_{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    docs = spark.read.parquet(DOCS_DIR)
    model = build_history_filter(docs, n_bits=1 << 26, k=6)
    shard = docs.filter(F.col("doc_id") % 5 < 2).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" novel-"),
                            F.col("doc_id").cast("string")))
        .alias("text"),
    )
    n = shard.count()
    dedup_against_history(shard, model, docs).write.format("noop").mode(
        "overwrite"
    ).save()  # warm
    t0 = time.monotonic()
    dedup_against_history(shard, model, docs).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.monotonic() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n, "sec": round(dt, 3)}


def run_bloom_scale() -> dict:
    """North-rule pair for incremental Bloom dedup: 1 vs 4 cores, fresh
    subprocess per level, merged into BENCH_LLM.json."""
    ensure_llm_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    pair = {}
    for level in (1, 4):
        pair[level] = run_scale_subprocess("--bloom-scale-one", level)
    thr1 = pair[1]["docs"] / pair[1]["sec"]
    thr4 = pair[4]["docs"] / pair[4]["sec"]
    out["bloom_scaling_1v4"] = {
        "docs": pair[1]["docs"],
        "sec_1": pair[1]["sec"], "sec_4": pair[4]["sec"],
        "docs_per_sec_1": round(thr1), "docs_per_sec_4": round(thr4),
        "scaling_efficiency": round((thr4 / thr1) / 4.0, 3),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return out["bloom_scaling_1v4"]


def ensure_stream_data() -> None:
    """8M-turn transcripts written as FOUR time-range chunks with distinct
    mod times (the file source orders batches by modification time), so
    `maxFilesPerTrigger` replays them as in-event-time-order micro-batches
    — the arrival contract stream_running_features documents. Probes
    derive from the same table (one file, single batch)."""
    import time as _t

    if os.path.exists(os.path.join(STREAM_DIR, "probes", "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from kgfarm_spark.session import get_spark
    from kgfarm_spark.sources.datagen import gen_probes, gen_transcripts

    spark = get_spark(app_name="kgfarm_stream_gen", master="local[32]")
    t = gen_transcripts(
        spark, n_turns=STREAM_TURNS, n_convs=STREAM_TURNS // 400
    ).localCheckpoint(eager=True)
    lo, hi = t.agg(F.min("ts"), F.max("ts")).first()
    tdir = os.path.join(STREAM_DIR, "transcripts")
    n_chunks = 4
    span = (hi - lo) / n_chunks
    for i in range(n_chunks):
        a = lo + span * i
        b = hi if i == n_chunks - 1 else lo + span * (i + 1)
        cond = (F.col("ts") >= F.lit(a)) & (
            F.col("ts") <= F.lit(b) if i == n_chunks - 1 else F.col("ts") < F.lit(b)
        )
        t.filter(cond).coalesce(8).write.mode("append").parquet(tdir)
        _t.sleep(1.2)  # distinct mod-time per chunk → stable batch order
    gen_probes(spark, t).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(STREAM_DIR, "probes")
    )
    spark.stop()


def run_convfe_scale() -> dict:
    """r06: the conversation feature-eng constructors at SCALE_TURNS
    turns (the 16M-turn transcript table) — preference pairs, dialogue
    context examples, SFT token masks. Results merge into BENCH_LLM.json
    under 'convfe_*' keys after every leg. SPARK_GRAFT_CONVFE_ONLY=
    "preference_pairs" re-benches a subset."""
    from pyspark.sql import functions as F

    from kgfarm_spark.operators.conversations import (
        dialogue_context_examples,
        preference_pairs,
        render_chat,
        sft_token_masks,
    )
    from kgfarm_spark.session import get_spark

    ensure_scale_data()
    path = os.path.join(REPO, "BENCH_LLM.json")
    out: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    spark = get_spark(
        app_name="kgfarm_convfe", master="local[8]", shuffle_partitions=64
    )
    t = spark.read.parquet(SCALE_DIR)
    n_turns = t.count()

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _pref() -> dict:
        df = preference_pairs(t)
        _noop(df)
        return {"pairs": df.count()}

    def _ctx() -> dict:
        _noop(dialogue_context_examples(t, k=4))
        return {"k": 4}

    def _sft() -> dict:
        from kgfarm_spark.operators.wordpiece import wordpiece_train

        corpus = render_chat(t).select(F.col("chat_text").alias("text"))
        t0 = time.monotonic()
        _, vocab = wordpiece_train(corpus, n_merges=500)
        train_sec = round(time.monotonic() - t0, 1)
        t1 = time.monotonic()
        _noop(sft_token_masks(t, vocab))
        mask_sec = round(time.monotonic() - t1, 1)
        return {
            "n_merges": 500, "vocab_train_sec": train_sec,
            "render_tokenize_mask_sec": mask_sec,
            "turns_per_sec": round(n_turns / mask_sec),
        }

    def _sft_packed() -> dict:
        """The full trainable-batch chain: render → tokenize+mask →
        pack into 2048-token sequences with masks riding along."""
        from kgfarm_spark.operators.packing import pack_sft_sequences
        from kgfarm_spark.operators.wordpiece import wordpiece_train

        corpus = render_chat(t).select(F.col("chat_text").alias("text"))
        _, vocab = wordpiece_train(corpus, n_merges=500)
        t1 = time.monotonic()
        masks = sft_token_masks(t, vocab)
        packed = pack_sft_sequences(masks, budget=2048, pad_token="[PAD]")
        n_seqs = packed.count()
        chain_sec = round(time.monotonic() - t1, 1)
        return {
            "budget": 2048, "sequences": n_seqs,
            "mask_pack_sec": chain_sec,
            "turns_per_sec": round(n_turns / chain_sec),
        }

    def _curate_convs() -> dict:
        """Conversation-native curation chain at 16M turns: integrity →
        render → exact dedup → pack. near-dup is EXCLUDED here by
        design: gen_transcripts draws text from a 9-word vocabulary, so
        every rendered conversation is a near-duplicate of every other
        (Jaccard ≈ 1 → LSH candidates ≈ all-pairs 40k² ≈ 1.6B — measured
        >20 min, output-bound on the degenerate corpus, not the kernel;
        the LSH kernel's honest scale number is the 5M diverse-doc row)."""
        from kgfarm_spark.operators.conversations import curate_conversations

        _, manifest = curate_conversations(
            t, min_turns=2, neardup=False, pack_budget=2048,
        )
        return {"stages": manifest["stages"],
                "note": "near-dup excluded: 9-word synthetic vocabulary "
                        "makes conversation-level Jaccard~1 all-pairs"}

    legs = {
        "convfe_preference_pairs": _pref,
        "convfe_dialogue_context": _ctx,
        "convfe_sft_token_masks": _sft,
        "convfe_sft_packed": _sft_packed,
        "convfe_curation_e2e": _curate_convs,
    }
    only = {x for x in (os.environ.get("SPARK_GRAFT_CONVFE_ONLY") or "").split(",") if x}
    for name, fn in legs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        extra = fn()
        dt = time.monotonic() - t0
        out[name] = {
            "turns": n_turns, "sec": round(dt, 1),
            "turns_per_sec_total": round(n_turns / dt), **extra,
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return {k: out[k] for k in legs if k in out}


def run_stream_scale(cpus: int = 8) -> dict:
    """Streaming bench evidence (VERDICT r04 #9): throughput + state-store
    size for the two flagship streaming operators at STREAM_TURNS turns,
    metrics from the StreamingQueryProgress feed.

    - `stream_running_features` (applyInPandasWithState): 4 in-order
      micro-batches (maxFilesPerTrigger=8 over 8-file chunks), state =
      one counter triple per conversation.
    - `stream_stream_asof_interval`: both sides streamed availableNow;
      join state is watermark+tolerance-bounded per the operator's
      contract."""
    import shutil
    import uuid

    from kgfarm_spark.session import get_spark
    from kgfarm_spark.streaming.stream import (
        stream_running_features,
        stream_stream_asof_interval,
    )

    ensure_stream_data()
    spark = get_spark(
        app_name="kgfarm_stream_scale", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    tdir = os.path.join(STREAM_DIR, "transcripts")
    pdir = os.path.join(STREAM_DIR, "probes")
    tschema = spark.read.parquet(tdir).schema
    pschema = spark.read.parquet(pdir).schema
    n_turns = spark.read.parquet(tdir).count()
    n_probes = spark.read.parquet(pdir).count()

    def drive(out_stream, ckpt: str) -> tuple[float, list]:
        t0 = time.monotonic()
        q = (
            out_stream.writeStream.format("noop")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 3)
        return wall, list(q.recentProgress)

    def state_summary(progress: list) -> dict:
        batches = [p for p in progress if p.get("numInputRows", 0) > 0]
        last_state = next(
            (p["stateOperators"][0] for p in reversed(progress) if p.get("stateOperators")),
            {},
        )
        return {
            "n_batches": len(batches),
            "input_rows": sum(p["numInputRows"] for p in batches),
            "output_rows": sum(
                (p.get("sink") or {}).get("numOutputRows", 0) for p in batches
            ),
            "state_rows": last_state.get("numRowsTotal"),
            "state_memory_mb": round(
                (last_state.get("memoryUsedBytes") or 0) / 1024**2, 1
            ),
        }

    out: dict = {"turns": n_turns, "probes": n_probes, "cpus": cpus}
    # SPARK_GRAFT_STREAM_ONLY="curate_stream" re-benches a subset (the
    # SPARK_GRAFT_CORPUS_ONLY pattern)
    only = {
        x for x in (os.environ.get("SPARK_GRAFT_STREAM_ONLY") or "").split(",") if x
    }

    def _want(name: str) -> bool:
        return not only or name in only

    base = os.path.join(REPO, ".bench", f"stream_ckpt_{uuid.uuid4().hex[:8]}")
    try:
        if _want("stream_running_features"):
            stream = (
                spark.readStream.schema(tschema)
                .option("maxFilesPerTrigger", 8)
                .parquet(tdir)
            )
            wall, prog = drive(
                stream_running_features(stream, watermark="0 seconds"),
                os.path.join(base, "run_feat"),
            )
            out["stream_running_features"] = {
                "sec": wall,
                "turns_per_sec": round(n_turns / wall, 1),
                **state_summary(prog),
            }

        if _want("stream_stream_asof_interval"):
            p_stream = spark.readStream.schema(pschema).parquet(pdir)
            t_stream = spark.readStream.schema(tschema).parquet(tdir)
            wall, prog = drive(
                stream_stream_asof_interval(
                    p_stream, t_stream, tolerance="4 hours", watermark="1 hour"
                ),
                os.path.join(base, "ss_asof"),
            )
            out["stream_stream_asof_interval"] = {
                "sec": wall,
                "rows_per_sec": round((n_turns + n_probes) / wall, 1),
                **state_summary(prog),
            }

        if _want("stream_asof_latest"):
            from kgfarm_spark.streaming.stream import stream_asof_latest

            # chunked triggers so the watermark ADVANCES between batches —
            # in a single availableNow batch the append-mode agg emits
            # nothing (watermark commits after the last batch), which would
            # bench the state shape but not the output path
            p_stream = (
                spark.readStream.schema(pschema)
                .option("maxFilesPerTrigger", 2)
                .parquet(pdir)
            )
            t_stream = (
                spark.readStream.schema(tschema)
                .option("maxFilesPerTrigger", 8)
                .parquet(tdir)
            )
            wall, prog = drive(
                stream_asof_latest(
                    p_stream, t_stream, tolerance="4 hours", watermark="1 hour"
                ),
                os.path.join(base, "ss_asof_latest"),
            )
            out["stream_asof_latest"] = {
                "sec": wall,
                "rows_per_sec": round((n_turns + n_probes) / wall, 1),
                **state_summary(prog),
                "note": "join + per-probe max agg (two stateful ops); output "
                        "one row per closed probe vs the interval twin's fan-out",
            }

        if not _want("curate_stream"):
            return out
        # ingest-time curation: model fit OFFLINE on the 1M reference
        # corpus (the production pattern — fit on a snapshot, apply to
        # the firehose), then the full curate_stream chain over the 5M
        # corpus; the fingerprint dedup is the only state store
        from pyspark.sql import functions as F

        from kgfarm_spark.streaming.online import curate_stream, fit_curation_model

        ensure_llm_data()
        t0 = time.monotonic()
        model = fit_curation_model(
            spark.read.parquet(DOCS_SCALE_DIR), max_vocab=1_000_000
        )
        fit_sec = round(time.monotonic() - t0, 1)
        dschema = spark.read.parquet(DOCS_DIR).schema
        n_docs = spark.read.parquet(DOCS_DIR).count()
        d_stream = (
            spark.readStream.schema(dschema)
            .option("maxFilesPerTrigger", 16)
            .parquet(DOCS_DIR)
            .withColumn(
                "ts",
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("doc_id") % 3600).cast("double")),
            )
        )
        wall, prog = drive(
            curate_stream(
                d_stream,
                model,
                watermark="1 hour",
                # synthetic 'w12345'-shaped words: relax the digit and
                # stopword rules exactly like the batch curate() bench
                # (the measurement target is the chain's cost)
                gate_kw={"max_digit_ratio": 1.0, "min_stopword_hits": 0},
            ),
            os.path.join(base, "curate_stream"),
        )
        out["curate_stream"] = {
            "sec": wall,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / wall, 1),
            "fit_sec_1m_ref": fit_sec,
            **state_summary(prog),
            "note": "gopher gate + fingerprint dedup-within-watermark + "
                    "frozen CCNet select; state = fingerprints inside the "
                    "watermark horizon only",
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--skew" in sys.argv:
        print(json.dumps(run_skew_bench()))
        return

    if "--e2e-scale" in sys.argv:
        print(json.dumps(run_pipeline_e2e_scale(cpus)))
        return

    if "--e2e-model-scale" in sys.argv:
        print(json.dumps(run_pipeline_e2e_scale(cpus, fit_model=True)))
        return

    if "--stream-scale" in sys.argv:
        print(json.dumps(run_stream_scale(min(cpus, 8))))
        return

    if "--convfe-scale-one" in sys.argv:
        level = int(sys.argv[sys.argv.index("--convfe-scale-one") + 1])
        print(json.dumps(run_convfe_scale_one(level)))
        return

    if "--convfe-scaling" in sys.argv:
        print(json.dumps(run_convfe_scaling()))
        return

    if "--convfe-scale" in sys.argv:
        print(json.dumps(run_convfe_scale()))
        return

    if "--llm-scale-one" in sys.argv:
        level = int(sys.argv[sys.argv.index("--llm-scale-one") + 1])
        print(json.dumps(run_llm_dedup_one(level)))
        return

    if "--tok-scale-one" in sys.argv:
        level = int(sys.argv[sys.argv.index("--tok-scale-one") + 1])
        print(json.dumps(run_tok_scale_one(level)))
        return

    if "--tok-scale" in sys.argv:
        print(json.dumps(run_tok_scale()))
        return

    if "--bloom-scale-one" in sys.argv:
        level = int(sys.argv[sys.argv.index("--bloom-scale-one") + 1])
        print(json.dumps(run_bloom_scale_one(level)))
        return

    if "--bloom-scale" in sys.argv:
        print(json.dumps(run_bloom_scale()))
        return

    if "--corpus-scale" in sys.argv:
        print(json.dumps(run_corpus_scale()))
        return

    if "--cc-scale" in sys.argv:
        print(json.dumps(run_cc_scale()))
        return

    if "--ann-scale" in sys.argv:
        print(json.dumps(run_ann_scale()))
        return

    if "--llm-scale" in sys.argv:
        print(json.dumps(run_llm_scale_bench()))
        return

    if "--scale-one" in sys.argv:
        level = int(sys.argv[sys.argv.index("--scale-one") + 1])
        print(json.dumps(run_scale_job(level)))
        return

    if "--scaling" in sys.argv:
        # N vs 4N parallelism on the SAME input. NOTE: this sandbox
        # advertises 32 CPUs but delivers ~8 effective cores (a raw
        # multiprocessing burn test scales 1->8 at ~8x but 8->32 at ~1.0x).
        # BOTH the 1v4 and 2v8 pairs are measured and emitted (ADVICE r01:
        # the below-threshold 2v8 datapoint must travel with the headline):
        # since the single-Window fusion the job is memory-bandwidth-heavy,
        # and cores on ONE box share that bandwidth — 2v8 historically
        # measures ~0.68 while 1v4 measures ~0.87-1.08. On a real cluster
        # each executor brings its own memory bandwidth, which the 1v4 pair
        # approximates; 2v8 is the pessimistic single-box bound. Override
        # pairs with SPARK_GRAFT_SCALE_LEVELS="lo,hi[;lo,hi]". Levels are
        # interleaved to smooth the sandbox's time-varying CPU allotment.
        pairs_env = os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4;2,8")
        pairs = [
            tuple(int(x) for x in p.split(",")) for p in pairs_env.split(";")
        ]
        levels = sorted({l for p in pairs for l in p})
        ensure_scale_data()
        results: dict[int, list] = {l: [] for l in levels}
        for _rep in range(2):
            for level in levels:
                results[level].append(
                    run_scale_subprocess("--scale-one", level)
                )
        n = results[levels[0]][0]["turns"]
        pair_recs = {}
        for lo, hi in pairs:
            sec_lo = min(r["sec"] for r in results[lo])
            sec_hi = min(r["sec"] for r in results[hi])
            thr_lo, thr_hi = n / sec_lo, n / sec_hi
            pair_recs[f"{lo}v{hi}"] = {
                f"sec_{lo}": sec_lo,
                f"sec_{hi}": sec_hi,
                f"turns_per_sec_{lo}": round(thr_lo, 1),
                f"turns_per_sec_{hi}": round(thr_hi, 1),
                "speedup": round(thr_hi / thr_lo, 3),
                "scaling_efficiency": round((thr_hi / thr_lo) / (hi / lo), 3),
            }
        lo0, hi0 = pairs[0]
        rec = {
            "metric": (
                f"flagship backfill+asof scaling, same input; headline pair "
                f"local[{lo0}] vs local[{hi0}], all measured pairs under 'pairs'"
            ),
            "turns": n,
            "scaling_efficiency": pair_recs[f"{lo0}v{hi0}"]["scaling_efficiency"],
            "pairs": pair_recs,
            "note": (
                "single box, ~8 effective cores shared memory bandwidth; "
                "2v8 is the pessimistic single-box bound, 1v4 approximates "
                "per-executor bandwidth on a real cluster"
            ),
        }
        # cache for the default-mode JSON line (driver records that one)
        with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
            json.dump(rec, f)
        print(json.dumps(rec))
        return

    load_start = os.getloadavg()
    r = run_once(sf_dir, cpus, HEADLINE)

    # §3.3 orchestration path (VERDICT r02 next-step #8): one timed
    # run_auto_pipeline pass at the bench SF with per-stage wall times
    # pulled from the lineage manifest
    pipeline_e2e = run_pipeline_e2e(sf_dir, cpus)
    load_end = os.getloadavg()

    total = round(sum(r["timings"].values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline as-of join + windowed feature-backfill suite wall time",
        "value": total,
        "unit": "sec",
        "queries": r["timings"],
        "n": r["n_runs"],
        "stat": "min",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns_per_sec": round(r["n_turns"] / r["timings"]["flagship_backfill_asof"], 1),
        "pipeline_e2e": pipeline_e2e,
        # load-aware bench hygiene (VERDICT r05 #7): loadavg brackets +
        # a fixed-cost calibration job so cross-round suite comparisons
        # can be load-normalized (divide suite wall by calibration_sec)
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "calibration_sec": r["calibration_sec"],
    }
    # attach the last `--scaling` measurement (N vs 4N evidence, BENCH.md §2)
    scaling_path = os.path.join(REPO, "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            out["scaling"] = json.load(f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
