"""Sessionization: batch window path + stateful streaming path must
agree with a hand-computed oracle and with each other."""

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spapy_spark.operators import sessionize
from spapy_spark.streaming import events as ev_stream
from spapy_spark.streaming import stateful


@pytest.fixture(scope="module")
def small_events(spark):
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1: three events close together, then a 2h gap, then one more
    for i, mins in enumerate([0, 5, 10, 130]):
        rows.append((i, (base + pd.Timedelta(minutes=mins)).to_pydatetime(), 1))
    # user 2: two sessions of one event each
    rows.append((10, base.to_pydatetime(), 2))
    rows.append((11, (base + pd.Timedelta(hours=3)).to_pydatetime(), 2))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_sessionize_batch(spark, small_events):
    out = sessionize.session_stats(small_events, gap_seconds=1800).collect()
    got = {(r["user_id"], r["session_seq"]): r["n_events"] for r in out}
    assert got == {(1, 1): 3, (1, 2): 1, (2, 1): 1, (2, 2): 1}


def test_sessionize_real_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = sessionize.session_stats(ev, gap_seconds=1800)
    total = s.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()  # every event lands in exactly one session
    assert s.where(F.col("n_events") <= 0).count() == 0


def test_stateful_streaming_matches_batch(spark, tmp_path, small_events):
    src = tmp_path / "ev_in"
    small_events.coalesce(1).write.parquet(str(src))
    stream = ev_stream.read_events_stream(spark, str(src))
    out = stateful.track_sessions(stream, gap_seconds=1800)
    (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_state")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_state").collect()
    }
    assert got == {1: (2, 4), 2: (2, 2)}


def test_asof_join_matches_pandas(spark):
    """asof_join vs pandas merge_asof (backward, inclusive) on the
    events fixture, both inner and left modes."""
    import pandas as pd
    from spapy_spark.operators import asof

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click")
    )
    got = asof.asof_join(
        views, clicks, on="ts", by="user_id", right_cols=["click"],
        suffix="_m", how="left",
    ).toPandas().sort_values("event_id").reset_index(drop=True)

    lp = views.toPandas().sort_values("ts")
    rp = clicks.toPandas().sort_values("ts")
    want = pd.merge_asof(
        lp, rp.rename(columns={"click": "click_m", "ts": "ts_m"}),
        left_on="ts", right_on="ts_m", by="user_id",
        direction="backward", allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    for a, b in zip(got["click_m"], want["click_m"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b
    inner = asof.asof_join(
        views, clicks, on="ts", by="user_id", right_cols=["click"],
        suffix="_m", how="inner",
    ).count()
    assert inner == int(want["click_m"].notna().sum())
