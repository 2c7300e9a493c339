"""IVF retrieval-quality measurement (VERDICT r9 item 3): recall@k of
the IVF-flat ANN path against exact brute-force ground truth, across
an (nlist, nprobe) grid and across store scales.

Method: the FIXED probe set (vec_id < 50 — copy-0 rows, byte-identical
across the synthesized scale dirs) is answered twice per config:

- exact: operators/similarity.py::cosine_topk_bruteforce — the ground
  truth (probe broadcast, corpus streamed);
- approximate: operators/similarity.py::cosine_topk_ivf — the same
  deterministic quantizer the persisted index uses
  (operators/ann_index.py; tests pin build+query == the batch
  operator, so these numbers ARE the persisted index's recall).

recall@k = |IVF top-k ∩ exact top-k| / k, averaged over probes. Both
rankings break ties identically (rounded sim DESC, neighbor_id ASC),
so the intersection is well-defined.

Usage: python tools/ivf_recall.py [scale ...]   (default: 1x x10 x100;
x10/x100 need the scale dirs from tools/scale_bench.py). Prints one
JSON line; paste the table into SCALE.md.
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

DIRS = {
    "1x": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "x10": "/tmp/scale_bench_x10",
    "x100": "/tmp/scale_bench_x100",
}
K = 5
GRID_NLIST = (16, 64)
GRID_NPROBE = (1, 2, 4, 8)


def main() -> None:
    scales = sys.argv[1:] or list(DIRS)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("crypto-etl-spark-ivf-recall")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from crypto_etl_airflow_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    results: dict[str, dict] = {}
    for scale in scales:
        d = DIRS[scale]
        if not os.path.isdir(d):
            print(f"# {scale}: {d} missing, skipped", file=sys.stderr)
            continue
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n_corpus = emb.count()
        probes = emb.filter(F.col("vec_id") < 50)
        t0 = time.perf_counter()
        exact = {}
        for r in cosine_topk_bruteforce(probes, emb, k=K).collect():
            exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
        exact_sec = round(time.perf_counter() - t0, 2)
        row: dict[str, object] = {
            "n_corpus": n_corpus, "exact_sec": exact_sec, "grid": {},
        }
        for nlist in GRID_NLIST:
            for nprobe in GRID_NPROBE:
                if nprobe > nlist:
                    continue
                t0 = time.perf_counter()
                approx = {}
                for r in cosine_topk_ivf(
                    probes, emb, k=K, nlist=nlist, nprobe=nprobe
                ).collect():
                    approx.setdefault(r.probe_id, set()).add(r.neighbor_id)
                sec = round(time.perf_counter() - t0, 2)
                recall = sum(
                    len(exact[p] & approx.get(p, set())) / len(exact[p])
                    for p in exact
                ) / len(exact)
                row["grid"][f"nlist={nlist},nprobe={nprobe}"] = {
                    "recall_at_5": round(recall, 3), "sec": sec,
                }
                print(
                    f"# {scale} nlist={nlist} nprobe={nprobe}: "
                    f"recall@5={recall:.3f} ({sec}s vs exact {exact_sec}s)",
                    file=sys.stderr, flush=True,
                )
        results[scale] = row

    print(json.dumps({"metric": "ivf_recall", "k": K, "scales": results}))
    spark.stop()


if __name__ == "__main__":
    main()
