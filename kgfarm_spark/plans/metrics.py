"""Per-stage metrics collection (north_rule: runs "emit per-stage
metrics").

Uses the Spark UI REST API (``/api/v1/applications/<id>/stages``) — the
same source the History Server reads, available on driver and cluster
alike, no py4j listener plumbing. ``StageMetrics`` snapshots completed
stage ids before a job and reports only the stages the wrapped action
ran, with task counts, executor run/CPU time, shuffle read/write bytes,
spill, and input bytes — the numbers that tell you whether a plan's
shuffle/spill behavior changed.

Usage:

    with StageMetrics(spark) as m:
        df.write.format("noop").mode("overwrite").save()
    print(m.summary())   # dict; m.stages is the per-stage list

Works in local mode and under spark-submit (the REST endpoint follows
``spark.ui.port``). If the UI is disabled, collection degrades to an
empty list rather than failing the job.
"""

from __future__ import annotations

import json
import urllib.request


def _get_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


class StageMetrics:
    _FIELDS = (
        "stageId", "name", "numTasks", "executorRunTime", "executorCpuTime",
        "inputBytes", "inputRecords", "outputBytes",
        "shuffleReadBytes", "shuffleWriteBytes",
        "memoryBytesSpilled", "diskBytesSpilled",
    )

    def __init__(self, spark, task_summaries: bool = False):
        self.spark = spark
        self.stages: list[dict] = []
        self._before: set[int] = set()
        self._base = None
        self._task_summaries = task_summaries
        ui = spark.sparkContext.uiWebUrl
        if ui:
            try:
                app_id = spark.sparkContext.applicationId
                self._base = f"{ui}/api/v1/applications/{app_id}/stages"
            except Exception:
                self._base = None

    def _completed(self) -> list[dict]:
        if not self._base:
            return []
        try:
            return _get_json(self._base + "?status=complete")
        except Exception:
            return []

    def __enter__(self):
        self._before = {s["stageId"] for s in self._completed()}
        return self

    def __exit__(self, *exc):
        raw = [s for s in self._completed() if s["stageId"] not in self._before]
        self.stages = [{k: s.get(k) for k in self._FIELDS} for s in raw]
        if self._task_summaries:
            # straggler visibility: per-stage max task duration from the
            # taskSummary endpoint (quantile 1.0 = the slowest task — the
            # number a skewed key moves even when total work is unchanged)
            for rec, s in zip(self.stages, raw):
                try:
                    ts = _get_json(
                        f"{self._base}/{s['stageId']}/{s.get('attemptId', 0)}"
                        "/taskSummary?quantiles=0.5,1.0"
                    )
                    rec["medianTaskMs"] = ts["duration"][0]
                    rec["maxTaskMs"] = ts["duration"][1]
                except Exception:
                    rec["medianTaskMs"] = rec["maxTaskMs"] = None
        self.stages.sort(key=lambda s: s["stageId"])
        return False

    def summary(self) -> dict:
        agg = {
            "n_stages": len(self.stages),
            "n_tasks": sum(s.get("numTasks") or 0 for s in self.stages),
            "executor_run_ms": sum(s.get("executorRunTime") or 0 for s in self.stages),
            "executor_cpu_ms": sum((s.get("executorCpuTime") or 0) // 1_000_000 for s in self.stages),
            "input_bytes": sum(s.get("inputBytes") or 0 for s in self.stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes") or 0 for s in self.stages),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes") or 0 for s in self.stages),
            "spill_disk_bytes": sum(s.get("diskBytesSpilled") or 0 for s in self.stages),
        }
        if self._task_summaries:
            agg["max_task_ms"] = max(
                (s.get("maxTaskMs") or 0 for s in self.stages), default=0
            )
        return agg
