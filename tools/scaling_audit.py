"""Measured scaling-curve audit: time every bench query at sf0.01 and
sf0.1 (10x the data) and report the ratio — the empirical check behind
the "this plan would survive 100x" claims. A ratio well above 10x after
normalizing by the calibration query (m3_dim_dates: constant work, no
scan — its ratio is the host/session noise floor) flags super-linear
behavior worth a plan audit; well below 10x means constant overheads
still dominate at these sizes.

Usage: python tools/scaling_audit.py [--json OUT.json] [passes]
Each query runs `passes` times per SF (default 2), min taken, full
materialization through the noop sink.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from glue_jobs_for_data_pipeline_spark.operators.dedup import release_caches  # noqa: E402
from glue_jobs_for_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_json = None
    args = sys.argv[1:]
    if args and args[0] == "--json":
        out_json = args[1]
        args = args[2:]
    passes = int(args[0]) if args else 2

    from bench import BENCH_QUERIES  # noqa: E402
    import __spark_entry__ as e  # noqa: E402

    spark = get_spark("scaling_audit")
    qs = e.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        rec: dict = {}
        for sf_dir, key in (
            ("/root/testdata/sf0.01", "sf0.01"),
            ("/root/testdata/sf0.1", "sf0.1"),
        ):
            samples = []
            for _ in range(passes):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
                release_caches()
            rec[key] = min(samples)
            rec[f"rows_{key}"] = qs[name](spark, sf_dir).count()
            release_caches()
        rec["ratio"] = round(rec["sf0.1"] / max(rec["sf0.01"], 1e-9), 2)
        # Output-volume context: a time ratio tracking rows_ratio is
        # data-proportional work (honest linear scaling — e.g.
        # x_fact_periodic_snapshot's part x month grain is ~1 group per
        # lineitem at these SFs, rows 50k -> 503k), NOT super-linearity;
        # the red flag is time ratio >> max(rows_ratio, calib noise).
        rec["rows_ratio"] = round(
            rec["rows_sf0.1"] / max(rec["rows_sf0.01"], 1), 2
        )
        results[name] = rec
        print(
            f"{name}: {rec['sf0.01']}s -> {rec['sf0.1']}s  x{rec['ratio']}"
            f"  (rows x{rec['rows_ratio']})"
        )

    calib = results.get("m3_dim_dates", {}).get("ratio", 1.0)
    summary = {"passes": passes, "calib_ratio": calib, "queries": results}
    print(json.dumps({"calib_ratio": calib, "n": len(results)}))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
