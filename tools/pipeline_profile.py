"""Per-stage wall-clock profile of the composed curation pipeline
(VERDICT r12 item 7): times a count() of each funnel stage — the
cost of stage k's count is the chain up to k, so successive deltas
attribute wall-clock to stages. Phase barriers make the attribution
honest: feat/g1/g2/g4 are materialized once when first computed, and
later stages reuse the checkpointed blocks, so each delta is the
NEW work its stage adds (plus the barrier materialization it
triggers).

Usage: python tools/pipeline_profile.py [sf_dir]
Prints one JSON line {stage: {rows, cum_sec, delta_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from crypto_etl_airflow_spark.plans.pipeline_curate import (
        _stages,
        pipeline_curate_corpus,
    )
    from crypto_etl_airflow_spark.sources.tables import load_table

    # warm-up: absorb JVM/codegen startup outside every timed window
    load_table(spark, sf_dir, "documents").count()

    t_start = time.perf_counter()
    s = _stages(spark, sf_dir)
    build_sec = round(time.perf_counter() - t_start, 3)  # eager barriers

    out: dict[str, dict] = {"_stage_build": {"cum_sec": build_sec}}
    prev = build_sec
    order = ["feat", "g1", "g2", "g3", "g4", "g5", "g6", "adm", "packed"]
    for key in order:
        # label jobs (guide §1): stage attribution in the UI/event log
        spark.sparkContext.setJobDescription(f"profile:{key}")
        t0 = time.perf_counter()
        # profile the NARROW twin where one exists — the production
        # dataflow; the text-bearing g2/g3/g5/g6 entries are lazy
        # compatibility views whose joins the pipeline never runs
        n = s.get(f"{key}n", s[key]).count()
        cum = round(build_sec + time.perf_counter() - t0, 3)
        # NOTE: stages downstream of a barrier recompute their suffix
        # chain per count; delta ≈ suffix cost from the last barrier
        out[key] = {
            "rows": n,
            "sec": round(time.perf_counter() - t0, 3),
        }
        prev = cum

    # the end-to-end manifest, timed as ONE fresh run (what bench.py
    # measures — includes barrier builds)
    t0 = time.perf_counter()
    pipeline_curate_corpus(spark, sf_dir).groupBy().count().collect()
    out["_end_to_end"] = {"sec": round(time.perf_counter() - t0, 3)}

    print(json.dumps({"metric": "pipeline_profile", "sf_dir": sf_dir,
                      "stages": out}), flush=True)


if __name__ == "__main__":
    main()
