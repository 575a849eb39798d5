"""Backward as-of join (operators/asof.py): tie/no-match semantics, the
one-row-per-match struct carry, and parity with DuckDB's NATIVE ASOF LEFT
JOIN on the events table — an engine-native oracle, not hand-rolled SQL."""

import datetime as dt

import duckdb
import pyspark.sql.functions as F
import pytest

from uk_ner_presidio_demo_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _t(s):
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _t(5)), (2, "u", _t(10)), (3, "u", _t(1)), (4, "w", _t(7)),
         (5, "u", _t(3))],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u", _t(2), 1.5),
            (101, "u", _t(5), 2.5),   # tie with lid=1 -> inclusive match
            (102, "u", _t(5), None),  # same (key, ts): max rid wins
            (103, "v", _t(0), 9.9),   # other key, never matches
        ],
        "rid long, user string, ts timestamp, score double",
    )
    return left, right


def test_backward_inclusive_semantics(frames):
    left, right = frames
    got = {
        r.lid: (r.asof_rid, r.asof_score)
        for r in asof_join(
            left, right, "user", "ts", ["rid", "score"], pick="rid"
        ).collect()
    }
    assert got == {
        1: (102, None),  # tie at t=5 matches; max-rid dedupe picked 102,
                         # and its NULL score must NOT stitch 101's 2.5
        2: (102, None),  # latest right at-or-before t=10 is still t=5
        3: (None, None),  # t=1 precedes every 'u' right row -> no
                          # backward match (never the FUTURE t=2 row)
        4: (None, None),  # key 'w' has no right rows -> left join NULLs
        5: (100, 1.5),  # plain backward match: latest at-or-before t=3
    }


def test_left_rows_and_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "user", "ts", ["rid"], pick="rid")
    assert out.count() == left.count()
    assert out.columns == ["lid", "user", "ts", "asof_rid"]


def test_null_timestamps_never_match(spark):
    """NULL-ts right rows must never match (DuckDB ASOF `l.ts >= r.ts`
    is no-match on NULL), and a NULL-ts left row gets NULL attrs —
    without the right-side filter the NULL-ts right row sorts first in
    the window and is carried onto early left rows."""
    left = spark.createDataFrame(
        [(1, "u", _t(5)), (2, "u", None)],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u", None, 1.0), (101, "u", _t(10), 2.0)],
        "rid long, user string, ts timestamp, score double",
    )
    got = {
        r.lid: (r.asof_rid, r.asof_score)
        for r in asof_join(
            left, right, "user", "ts", ["rid", "score"], pick="rid"
        ).collect()
    }
    # lid=1 at t=5 precedes the only real right row (t=10): no match —
    # the NULL-ts right row must NOT have been carried onto it; lid=2
    # (NULL left ts) matches nothing.  This is the pandas merge_asof
    # contract (it refuses NULL keys outright).  DuckDB's NATIVE ASOF is
    # the one engine that disagrees — its sort-based matcher puts NULLs
    # last, so NULL-ts probes match NULL-ts builds as an implementation
    # artifact (verified: the same frames give lid=2 -> rid=100 there).
    # The driver row's oracle is unaffected: events.ts is non-null, and
    # the operator's contract documents the NULL rule explicitly.
    assert got == {1: (None, None), 2: (None, None)}


def test_null_keys_never_match(spark):
    """NULL join keys never match (merge_asof refuses them; an ASOF
    equi-condition is no-match on NULL) — but NULL-key LEFT rows are
    still emitted with NULL attrs (left-join semantics)."""
    left = spark.createDataFrame(
        [(1, None, _t(5)), (2, "u", _t(5))],
        "lid long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, None, _t(1), 1.0), (101, "u", _t(2), 2.0)],
        "rid long, user string, ts timestamp, score double",
    )
    got = {
        r.lid: (r.asof_rid, r.asof_score)
        for r in asof_join(
            left, right, "user", "ts", ["rid", "score"], pick="rid"
        ).collect()
    }
    assert got == {1: (None, None), 2: (101, 2.0)}


def test_duckdb_native_asof_parity(spark, sf01):
    """clicks ASOF LEFT JOIN views per user on real events data — the
    Spark union+window form must equal DuckDB's built-in ASOF JOIN."""
    ev = spark.read.parquet(f"{sf01}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), "value"
    )
    got = (
        asof_join(clicks, views, "user_id", "ts", ["view_id", "value"],
                  pick="view_id")
        .select("event_id", "asof_view_id", "asof_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.execute(f"""
        WITH ev AS (SELECT * FROM read_parquet('{sf01}/events.parquet')),
        views AS (
            SELECT user_id, ts, event_id AS view_id, value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC
                ) AS rn FROM ev WHERE event_type = 'view'
            ) WHERE rn = 1
        )
        SELECT c.event_id, v.view_id AS asof_view_id,
               v.value AS asof_value
        FROM (SELECT * FROM ev WHERE event_type = 'click') c
        ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id
    """).df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["event_id"].values == want["event_id"].values).all()
    # ids exact; value passes through unchanged (no arithmetic) -> exact
    g_ids = got["asof_view_id"].astype("float").values
    w_ids = want["asof_view_id"].astype("float").values
    assert ((g_ids == w_ids) | ((g_ids != g_ids) & (w_ids != w_ids))).all()
    g_val = got["asof_value"].values
    w_val = want["asof_value"].values
    assert ((g_val == w_val) | ((g_val != g_val) & (w_val != w_val))).all()


def test_reserved_name_collision_raises(frames):
    """ADVICE r6: an input column named like an internal temp column
    (_rn/_side/_r/_match/_l_<leftcol>) must raise, not silently corrupt
    the join."""
    left, right = frames
    with pytest.raises(ValueError, match="_side"):
        asof_join(left.withColumn("_side", F.lit(1)), right,
                  "user", "ts", ["rid"], pick="rid")
    with pytest.raises(ValueError, match="_match"):
        asof_join(left, right.withColumn("_match", F.lit(0)),
                  "user", "ts", ["rid"], pick="rid")
    # _l_<col> of an actual left column collides too
    with pytest.raises(ValueError, match="_l_lid"):
        asof_join(left.withColumn("_l_lid", F.lit(0)), right,
                  "user", "ts", ["rid"], pick="rid")


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


@pytest.mark.parametrize("width", [1, 7, 3600])
def test_bucketed_equals_single_window(frames, width):
    """asof_join_bucketed is a PHYSICAL variant: identical output to
    asof_join at every bucket width (the width only moves rows between
    window partitions)."""
    from uk_ner_presidio_demo_spark.operators.asof import asof_join_bucketed

    left, right = frames
    base = _sorted_rows(
        asof_join(left, right, "user", "ts", ["rid", "score"], pick="rid")
    )
    got = _sorted_rows(
        asof_join_bucketed(left, right, "user", "ts", ["rid", "score"],
                           pick="rid", bucket_width=width)
    )
    assert got == base


def test_bucketed_hot_key_and_nulls_parity(spark):
    """Planted hot key (one user owning ~two thirds of both sides) plus
    NULL ts / NULL key rows on both sides: the bucketed form must agree
    with the single-window form row-for-row — the hot key is exactly
    the input it exists for, and the NULL semantics must not drift
    between the physical strategies."""
    from uk_ner_presidio_demo_spark.operators.asof import asof_join_bucketed

    left_rows = [(i, "hot", _t(i % 211)) for i in range(400)]
    left_rows += [(1000 + i, f"u{i % 13}", _t((7 * i) % 211))
                  for i in range(200)]
    left_rows += [(2000, "hot", None), (2001, None, _t(5))]
    right_rows = [(10_000 + i, "hot", _t((3 * i) % 197), float(i))
                  for i in range(300)]
    right_rows += [(20_000 + i, f"u{i % 13}", _t((11 * i) % 197), float(i))
                   for i in range(100)]
    right_rows += [(30_000, "hot", None, 1.0), (30_001, None, _t(3), 2.0)]
    left = spark.createDataFrame(
        left_rows, "lid long, user string, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "rid long, user string, ts timestamp, score double")
    base = _sorted_rows(
        asof_join(left, right, "user", "ts", ["rid", "score"], pick="rid")
    )
    for width in (1, 60):
        got = _sorted_rows(
            asof_join_bucketed(left, right, "user", "ts",
                               ["rid", "score"], pick="rid",
                               bucket_width=width)
        )
        assert got == base, f"width={width}"


def test_bucketed_bad_width(frames):
    from uk_ner_presidio_demo_spark.operators.asof import asof_join_bucketed

    left, right = frames
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join_bucketed(left, right, "user", "ts", ["rid"],
                           pick="rid", bucket_width=0)
