"""Interactive profiling helpers for the optimization rounds.

Run inside a REPL (``python -i tools/profile_query.py``): builds a session
with the Spark UI enabled so per-job/per-stage wall-clock and shuffle
metrics can be pulled from the status REST API, and exposes ``prof(name)``
to time one registered query with a labeled job description.

Not part of the driver contract; measurement only (guide §1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crick_spark.plans import QUERIES  # noqa: E402
from crick_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(
    "crick-spark-profile",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.range(1_000_000).count()


def _sweep():
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def _api(path: str):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def prof(name: str, warm: bool = True, sweep: bool = True):
    """Time one registered query; print per-job wall clock from the UI API."""
    fn = QUERIES[name].fn
    if warm:
        fn(spark, SF_DIR).collect()
        _sweep()
    jobs_before = {j["jobId"] for j in _api("jobs")}
    spark.sparkContext.setJobDescription(f"prof:{name}")
    t0 = time.time()
    fn(spark, SF_DIR).collect()
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    jobs = [j for j in _api("jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"== {name}: {wall:.3f}s wall, {len(jobs)} jobs ==")
    for j in jobs:
        t_sub = j.get("submissionTime", "")
        t_end = j.get("completionTime", "")
        dur = ""
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = (
                datetime.strptime(t_end, fmt) - datetime.strptime(t_sub, fmt)
            ).total_seconds()
            dur = f"{d:7.3f}s"
        except Exception:
            pass
        desc = (j.get("description") or j.get("name") or "")[:90]
        print(
            f"  job {j['jobId']:4d} {dur} tasks={j.get('numTasks', '?'):4} {desc}"
        )
    if sweep:
        _sweep()
    return wall


def psum(name: str, warm: bool = True):
    """Compact one-line profile: wall, job count, summed job time, gap."""
    from datetime import datetime

    fn = QUERIES[name].fn
    if warm:
        fn(spark, SF_DIR).collect()
        _sweep()
    jb = {j["jobId"] for j in _api("jobs")}
    spark.sparkContext.setJobDescription(f"prof:{name}")
    t0 = time.time()
    fn(spark, SF_DIR).collect()
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    jobs = [j for j in _api("jobs") if j["jobId"] not in jb]
    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    ds = []
    for j in jobs:
        try:
            ds.append(
                (
                    datetime.strptime(j["completionTime"], fmt)
                    - datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
            )
        except (KeyError, ValueError):
            ds.append(0.0)
    top = sorted(ds, reverse=True)[:5]
    print(
        f"{name}: wall={wall:.2f}s jobs={len(jobs)} "
        f"jobtime={sum(ds):.2f}s gap={wall - sum(ds):.2f}s "
        f"top5={[round(x, 2) for x in top]}"
    )
    _sweep()
    return wall


def stages_of_last(n: int = 30):
    """Print the n most recent stages with durations and shuffle bytes."""
    st = _api("stages?status=complete")
    st.sort(key=lambda s: -s["stageId"])
    for s in st[:n]:
        print(
            f"stage {s['stageId']:4d} {s.get('numCompleteTasks', 0):4d} tasks "
            f"exec {s.get('executorRunTime', 0) / 1000:8.2f}s "
            f"shW {s.get('shuffleWriteBytes', 0) / 1e6:8.2f}MB "
            f"shR {s.get('shuffleReadBytes', 0) / 1e6:8.2f}MB  "
            f"{(s.get('description') or s.get('name', ''))[:70]}"
        )


def explain_to(name: str, path: str):
    """Write explain('formatted') for a query to a file."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name].fn(spark, SF_DIR).explain("formatted")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


if __name__ == "__main__":
    print(f"profiling session ready: SF_DIR={SF_DIR}")
    print("use prof('query_name'), stages_of_last(), explain_to(name, path)")
