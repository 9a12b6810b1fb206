"""Per-pass bench variance probe: runs the headline bench queries for N
full passes and records EVERY pass's per-query wall time (bench.py keeps
only the min), so host-interference noise is separable from engine cost.

Usage: python tools/bench_variance.py [n_passes] [out.json]

Reads the same env knobs as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS). Output: per-query list of pass timings plus
min/median/max/spread summary — committed per round as
BENCH_VARIANCE_r{N}.json when a regression needs explaining.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from glue_jobs_for_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from glue_jobs_for_data_pipeline_spark.operators.dedup import release_caches

    spark = get_spark("bench_variance")
    qs = e.queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for warm in ("m2_j2_fact_population", "x_dedup_minhash_lsh", "x_stream_window_agg"):
        try:
            qs[warm](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass

    passes: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for i in range(n_passes):
        for name in BENCH_QUERIES:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes[name].append(round(time.time() - t0, 3))
            release_caches()
        print(f"pass {i + 1}/{n_passes} done", file=sys.stderr)

    summary = {
        name: {
            "passes": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "max": max(ts),
            "max_over_min": round(max(ts) / min(ts), 2),
        }
        for name, ts in passes.items()
    }
    doc = {
        "sf_dir": sf_dir,
        "n_passes": n_passes,
        "total_min": round(sum(v["min"] for v in summary.values()), 3),
        "total_median": round(sum(v["median"] for v in summary.values()), 3),
        "queries": summary,
    }
    print(json.dumps(doc, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
