"""Scaling diagnostic: run ONE crawl-ladder leg with the Spark UI enabled
and dump per-stage task metrics from the REST API, so the N-vs-4N gap is
attributed to measured quantities (task time, spill, straggle, driver gaps)
instead of guessed at from stage-boundary wall timers.

Usage: python scripts/diag_scaling.py <cores> [n_hosts] [outfile] [driver_mem]

For each completed stage:  wall (completion - submission), executorRunTime
(sum of task run time), utilization = runTime / (wall * cores), spill bytes,
task count.  Low-utilization wall-heavy stages are the scaling killers; the
residual (leg wall - sum of stage walls, overlaps ignored) is driver time.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1])
N_HOSTS = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
OUTFILE = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/diag_scaling_{CORES}.json"
DRIVER_MEM = sys.argv[4] if len(sys.argv) > 4 else "8g"


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mlscraper_spark.crawl.engine import CrawlConfig, read_fetch_log, run_crawl
    from mlscraper_spark.crawl.synthweb import WebConfig

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + ":" + os.environ.get("PYTHONPATH", "")
    spark = (
        SparkSession.builder.appName(f"diag-{CORES}")
        .master(f"local[{CORES}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    from bench import _warm_python_workers

    _warm_python_workers(spark)

    web = WebConfig(n_hosts=N_HOSTS, max_pages_per_host=40, links_per_page=4)
    seeds = spark.range(N_HOSTS).select(
        F.format_string("http://host%d.test/page/0", F.col("id")).alias("raw")
    )
    workdir = f"/tmp/diag_scaling_{CORES}_work"
    shutil.rmtree(workdir, ignore_errors=True)
    t0 = time.time()
    run_crawl(spark, workdir, seeds, web,
              CrawlConfig(budget_per_host=8, n_buckets=32), max_epochs=2)
    wall = time.time() - t0
    urls = read_fetch_log(spark, workdir).count()
    shutil.rmtree(workdir, ignore_errors=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    stages = _get("/stages?status=complete")
    jobs = _get("/jobs")
    stage2job = {}
    for j in jobs:
        for sid in j.get("stageIds", []):
            stage2job[sid] = j["jobId"]
    out_stages = []
    for s in stages:
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        if not sub or not comp:
            continue
        from datetime import datetime

        def _ts(x):
            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        w = _ts(comp) - _ts(sub)
        rt = s.get("executorRunTime", 0) / 1000.0
        out_stages.append(
            {
                "stage": s["stageId"],
                "attempt": s["attemptId"],
                "job": stage2job.get(s["stageId"]),
                "name": s["name"].split("\n")[0][:90],
                "tasks": s.get("numCompleteTasks"),
                "wall_s": round(w, 2),
                "run_s": round(rt, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1000.0, 2),
                "deser_s": round(s.get("executorDeserializeTime", 0) / 1000.0, 2),
                "util": round(rt / (w * CORES), 2) if w > 0 else None,
                "spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            }
        )
    out_stages.sort(key=lambda x: -x["wall_s"])
    # task-level quantiles for the most task-time-heavy stages: where does
    # a task's wall go (compute vs scheduler delay vs deserialize vs gc)?
    for st in sorted(out_stages, key=lambda x: -x["run_s"])[:8]:
        try:
            q = _get(
                f"/stages/{st['stage']}/{st['attempt']}/taskSummary"
                "?quantiles=0.5,0.95"
            )
            st["task_q"] = {
                k: [round(v / 1000.0, 2) for v in q[k]]
                for k in (
                    "executorRunTime", "executorCpuTime", "schedulerDelay",
                    "executorDeserializeTime", "jvmGcTime",
                )
                if k in q
            }
            if "executorCpuTime" in st["task_q"]:
                st["task_q"]["executorCpuTime"] = [
                    round(v / 1e6, 2) for v in q["executorCpuTime"]
                ]
        except Exception:
            pass
    # driver gaps: job timeline coverage vs leg wall
    from datetime import datetime

    def _ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = sorted(
        (_ts(j["submissionTime"]), _ts(j["completionTime"]))
        for j in jobs
        if j.get("submissionTime") and j.get("completionTime")
    )
    covered, cur_s, cur_e = 0.0, None, None
    for s0, e0 in spans:
        if cur_s is None:
            cur_s, cur_e = s0, e0
        elif s0 <= cur_e:
            cur_e = max(cur_e, e0)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s0, e0
    if cur_s is not None:
        covered += cur_e - cur_s
    # per-job records + the gap before each job (driver time attribution)
    out_jobs = []
    prev_end = None
    for j in sorted(jobs, key=lambda x: x.get("submissionTime") or ""):
        if not (j.get("submissionTime") and j.get("completionTime")):
            continue
        s0, e0 = _ts(j["submissionTime"]), _ts(j["completionTime"])
        out_jobs.append(
            {
                "job": j["jobId"],
                "name": (j.get("name") or "")[:80],
                "dur_s": round(e0 - s0, 2),
                "gap_before_s": round(max(0.0, s0 - prev_end), 2)
                if prev_end is not None
                else 0.0,
            }
        )
        prev_end = max(prev_end or e0, e0)
    out_jobs.sort(key=lambda x: -(x["gap_before_s"]))
    # SQL node metrics: per-operator attribution for the heaviest queries
    sql_heavy = []
    try:
        for qd in _get("/sql?details=true&planDescription=false&length=200"):
            dur = qd.get("duration", 0)
            nodes = []
            for n in qd.get("nodes", []):
                m = {mm["name"]: mm["value"] for mm in n.get("metrics", [])}
                keep = {
                    k: m[k]
                    for k in ("time in aggregation build", "duration",
                              "time to build", "task commit time",
                              "shuffle write time", "time in compression",
                              "cache hits", "number of output rows")
                    if k in m
                }
                if keep:
                    nodes.append({"node": n["nodeName"][:60], **keep})
            sql_heavy.append(
                {"id": qd["id"], "dur_ms": dur,
                 "desc": (qd.get("description") or "")[:80], "nodes": nodes}
            )
        sql_heavy.sort(key=lambda x: -x["dur_ms"])
        sql_heavy = sql_heavy[:6]
    except Exception as e:
        sql_heavy = [{"err": str(e)}]
    result = {
        "cores": CORES,
        "n_hosts": N_HOSTS,
        "driver_mem": DRIVER_MEM,
        "wall_s": round(wall, 2),
        "urls": urls,
        "urls_per_sec": round(urls / wall, 1),
        "job_covered_s": round(covered, 2),
        "driver_gap_s": round(wall - covered, 2),
        "n_jobs": len(jobs),
        "n_stages": len(out_stages),
        "sum_stage_wall_s": round(sum(s["wall_s"] for s in out_stages), 2),
        "sum_run_s": round(sum(s["run_s"] for s in out_stages), 2),
        "sum_spill_mb": round(sum(s["spill_mb"] for s in out_stages), 1),
        "stages": out_stages[:40],
        "jobs_by_gap": out_jobs[:30],
        "sql_heavy": sql_heavy,
    }
    with open(OUTFILE, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "stages"}))
    spark.stop()


if __name__ == "__main__":
    main()
