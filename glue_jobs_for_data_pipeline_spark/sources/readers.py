"""Sources and sinks (SURVEY §2.1).

S1  CSV bulk load with explicit schema + header skip
    (reference: validate_data.py:138-146 — Redshift COPY ... CSV IGNOREHEADER 1)
S2  truncate-and-load -> write mode("overwrite")   (validate_data.py:139)
S3  table scan -> spark.read.parquet               (populate_fact.py:111)
S6  INSERT INTO ... SELECT -> write mode("append") (dynamic_upsert.py:120-122)

Scale notes: explicit schemas (no inferSchema pass over 100 TB), parquet
as the canonical storage (columnar, predicate pushdown + column pruning
reach the scan), writers take ``partition_by`` so big tables land
partitioned by their pruning key (e.g. fact by date).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """S1: schema-first CSV bulk load (COPY ... DELIMITER ',' IGNOREHEADER 1)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S3: scan one driver testdata parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the source is coarser than the
    cluster's parallelism (e.g. a single-row-group parquet file, which is
    unsplittable, serializes every downstream CPU-heavy stage onto one
    task). At scale — many files / row groups — the partition count
    already exceeds defaultParallelism and this is a no-op, so wide
    inputs never pay a gratuitous full shuffle. Checking the partition
    count reads plan metadata; it launches no job.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_json_table(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-first JSON lines read (no inference pass — at 100 TB an
    inferSchema scan doubles the read)."""
    return spark.read.schema(schema).json(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar with predicate pushdown, like parquet."""
    return spark.read.orc(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Two tables bucketed the same way co-locate their join: Catalyst
    drops both shuffle Exchanges from the sort-merge join — at 100 TB
    this converts the recurring join cost into a one-time write cost.
    Requires a catalog table (saveAsTable), not a bare path.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events fixture's ``ts`` column to TimestampType
    regardless of the physical layout the fixture was written with.
    Layouts seen across driver generations:

    - TIMESTAMP(NANOS) read as long via the nanosAsLong legacy conf ->
      truncate to microseconds with integer ``div`` (a double division
      would lose precision at ~1.7e18 ns) and convert.
    - plain ``timestamp[us]`` read as TIMESTAMP_NTZ (pandas writes
      isAdjustedToUTC=false) -> cast to TimestampType (identity on the
      underlying instant under a UTC session timezone, which is what the
      DuckDB oracle's naive TIMESTAMP compares equal to).
    - already TimestampType -> pass through.

    Branching on the resolved schema (metadata-only, no job) keeps one
    reader working across fixture regenerations instead of silently
    misreading µs-int64 as nanos.
    """
    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        # The NTZ->LTZ cast interprets the wall-clock value in the
        # SESSION timezone — under a non-UTC session every instant would
        # silently shift by the zone offset (the nanos branch above has
        # no such dependence). The engine's contract is UTC everywhere
        # (session.py pins it). Raise rather than silently reconfigure:
        # flipping spark.sql.session.timeZone here would mutate GLOBAL
        # session state as a side effect of a read, changing every
        # unrelated timestamp query for the rest of a deliberately
        # non-UTC session (ADVICE r06).
        spark = df.sparkSession
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        if tz != "UTC":
            raise ValueError(
                "normalize_event_ts: events fixture has a TIMESTAMP_NTZ "
                f"ts column but the session timezone is {tz!r}, not UTC "
                "— the NTZ->timestamp cast would shift every instant by "
                "the zone offset. Set spark.sql.session.timeZone=UTC "
                "(get_spark() does) before loading events."
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 variant for the events fixture: resolve the parquet's actual
    ``ts`` layout and normalize it to TimestampType (see
    :func:`normalize_event_ts`). The nanosAsLong conf is set up front so
    a TIMESTAMP(NANOS) fixture resolves as long instead of erroring; it
    is a no-op for µs fixtures.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)


def write_overwrite(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """S2: truncate-and-load full refresh (TRUNCATE + COPY)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_append(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """S6: INSERT INTO ... SELECT append."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*"
) -> DataFrame:
    """Directory-of-binary-files ingest via Spark's built-in
    ``binaryFile`` source — the entry point for raw multimodal assets
    (images, audio clips) that arrive as one file per item rather than
    rows in a table. Returns (file_name, n_bytes, content): the file's
    basename, its size, and the raw bytes as a BinaryType column ready
    for the multimodal operators (decode_media, resize_luma_grid,
    phash_signatures).

    Scale shape: the source lists files on the driver but reads
    contents in executors (one task per file group), so a million-image
    bucket scans in parallel; pushdown-friendly (`pathGlobFilter`
    prunes at listing time, `modificationTime`/`length` predicates
    before content reads). Content is capped by
    spark.sql.sources.binaryFile.maxLength (defaults to INT_MAX) —
    chunk giant assets upstream.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


def scratch_dir(prefix: str) -> str:
    """Per-invocation mkdtemp scratch registered for atexit cleanup —
    the ONE staging-path primitive every write-then-read-back query
    uses (a fixed literal path races: dual-SF sweeps and concurrent
    runs rebuild it under a lazily-read frame — ADVICE r04/r14).

    Root: ``SPARK_GRAFT_SCRATCH_ROOT`` env var, else the platform
    tempdir. On a real cluster the root MUST be a filesystem shared by
    driver and executors (see README "Scratch storage contract") —
    executor tasks write staged files that other executors read back.
    Cleanup defers to interpreter exit because returned DataFrames read
    the dir lazily (the driver collects after the query function
    returns).
    """
    import atexit
    import os
    import shutil
    import tempfile

    root = os.environ.get("SPARK_GRAFT_SCRATCH_ROOT") or None
    if root:
        os.makedirs(root, exist_ok=True)
    d = tempfile.mkdtemp(prefix=prefix, dir=root)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
