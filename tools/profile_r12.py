"""Round-12 measurement harness (guide §1): per query, time plan
CONSTRUCTION separately from EXECUTION (noop sink), save
``explain("formatted")`` under plans/<tag>/, and summarize plan shape
(Exchange count, join strategies, Python-eval nodes).

Usage: python tools/profile_r12.py <out_tag> [query ...]
  out_tag   plans/<out_tag>/<query>_<suffix>.txt (suffix from --suffix,
            default 'before')
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Spark-version note (tool-only, never on a query path): the job counter
reads the private `dagScheduler().nextJobId()` and plans come via
`PythonSQLUtils.explainString` — both verified against Spark 4.1.x, the
version this repo pins. If a Spark upgrade moves either surface, swap in
a SparkListener (onJobStart counter) and DataFrame.explain capture.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_snowflake_kinesis_airflow_pipeline_spark.plans.registry import QUERIES
from aws_snowflake_kinesis_airflow_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_stats(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "nested_loop": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "python_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython)\b", txt)
        ),
        "map_in_arrow": len(
            re.findall(r"\b(MapInArrow|FlatMapGroupsInPandas|MapInPandas)\b", txt)
        ),
        "sorts": len(re.findall(r"\bSort\b", txt)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = os.environ.get("PROFILE_SUFFIX", "before")
    names = sys.argv[2:] or list(QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"profile_{tag}")
    # Warm-up (same as bench.py): JVM JIT + parquet footers + UDF workers.
    QUERIES["ref_daily_event_summary"].fn(spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    def job_id() -> int:
        """Monotone DAGScheduler job counter — standalone build-time jobs
        (eager checkpoints, fit collects) are invisible in the plan but
        each costs a full scheduling round; this counts them robustly
        under host noise."""
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    rows = []
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = job_id()
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        j_build = job_id() - j0
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        j1 = job_id()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        j_exec = job_id() - j1
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)
        st = plan_stats(txt)
        rows.append({"q": name, "build_s": round(t_build, 3),
                     "exec_s": round(t_exec, 3),
                     "build_jobs": j_build, "exec_jobs": j_exec, **st})
        print(json.dumps(rows[-1]), flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(os.path.join(out_dir, f"profile_{suffix}.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
