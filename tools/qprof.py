"""Per-query micro-bench: time one (or a few) registered queries with
the bench's exact methodology (noop sink, min-of-N, staged-cache reset)
without paying for the whole 93-query bill — the isolation tool guide
§1 asks for. Optionally dumps .explain('formatted') to a file.

Usage:
    python tools/qprof.py [--passes N] [--explain-dir DIR] [--sf DIR] key ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_jobs_for_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    explain_dir = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--explain-dir":
            explain_dir = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            keys.append(args[i]); i += 1

    import __spark_entry__ as e

    spark = get_spark("qprof")
    qs = e.queries()
    from glue_jobs_for_data_pipeline_spark.operators.dedup import release_caches
    from glue_jobs_for_data_pipeline_spark.plans.staging import reset_stage_caches

    # warmup: codegen/broadcast machinery at the smallest SF
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for k in keys:
        try:
            qs[k](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass
        release_caches()

    samples: dict[str, list[float]] = {k: [] for k in keys}
    for p in range(passes):
        reset_stage_caches()
        for k in keys:
            spark.sparkContext.setJobDescription(f"qprof:{k}")
            t0 = time.time()
            df = qs[k](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[k].append(round(time.time() - t0, 3))
            if explain_dir and p == 0:
                os.makedirs(explain_dir, exist_ok=True)
                with open(os.path.join(explain_dir, f"{k}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            release_caches()
            spark.sparkContext.setJobDescription(None)
    for k in keys:
        xs = samples[k]
        print(f"{min(xs):8.3f}  min | {sorted(xs)[len(xs)//2]:8.3f} med | "
              f"{xs}  {k}")


if __name__ == "__main__":
    main()
