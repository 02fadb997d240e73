"""Per-stage profile of headline queries via the Spark UI REST API.

For each query: one warm run, then N measured runs (noop sink). After
each measured run, pulls that run's jobs+stages from the local REST API
and prints a per-stage breakdown (duration, task count, input/shuffle
bytes) plus the job-gap overhead (wall time not covered by any stage).

Usage: PYTHONPATH=/root/repo python tools/profile_stages.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    import __spark_entry__ as entry
    import bench

    spark = get_spark("warpdb-profile")
    sc = spark.sparkContext
    base = sc.uiWebUrl + "/api/v1/applications/" + sc.applicationId
    qs = entry.queries()
    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in qs]

    for name in names:
        # warm twice (plan codegen + cache effects mirror bench steady passes)
        for _ in range(2):
            _force(qs[name](spark, SF_DIR))
        best = None
        for _ in range(RUNS):
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            t0 = time.perf_counter()
            sc.setJobDescription(f"profile:{name}")
            _force(qs[name](spark, SF_DIR))
            wall = time.perf_counter() - t0
            sc.setJobDescription(None)
            if best is None or wall < best[0]:
                best = (wall, jobs_before)
        wall, jobs_before = best
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stage_ids)} stages ===")
        covered = 0.0
        for sid in stage_ids:
            try:
                arr = _api(base, f"/stages/{sid}")
            except Exception:
                continue
            for st in arr:
                if st["status"] not in ("COMPLETE", "SKIPPED"):
                    continue
                dur = 0.0
                if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t1 = datetime.strptime(st["firstTaskLaunchedTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    t2 = datetime.strptime(st["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    dur = (t2 - t1).total_seconds()
                covered += dur
                print(
                    f"  stage {sid:>4} {st['status']:8} {dur:7.3f}s tasks={st['numCompleteTasks']:>3}"
                    f" in={st['inputBytes']:>10} sw={st['shuffleWriteBytes']:>9} sr={st['shuffleReadBytes']:>9}"
                    f" exRun={st['executorRunTime']/1000:7.3f}s cpu={st['executorCpuTime']/1e9:7.3f}s"
                    f"  {st['name'].split(' at ')[0][:40]}"
                )
        print(f"  stage-covered {covered:.3f}s vs wall {wall:.3f}s -> gap {wall - covered:.3f}s")


if __name__ == "__main__":
    main()
