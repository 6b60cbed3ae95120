"""Adversarial-data oracle parity for the round-6 time-series / graph /
encoding operators — degenerate shapes the generated testdata never
produces (the round-5 rule: every data-derived zero-guard gets a fixture
that actually exercises it).

* ts_autocorr_lag: a CONSTANT hourly series zeroes both variances
  (vx = vy = 0) — the unguarded Pearson is 0/0; the guard must emit 0.0
  in BOTH engines. A 5-bucket series has no lag-24 pairs at all and must
  vanish from the lag-24 rows, not divide by an empty-count.
* ts_seasonal_naive: types with no bucket 24h earlier must be ABSENT
  (calendar join skips gaps); a constant series must report mae = 0.0.
* ts_resample_ohlc: two events with the IDENTICAL timestamp inside one
  bucket — open/close must follow the (ts, event_id) total order, so
  the tie is broken by event_id in both engines.
* graph_degree_assortativity: a 3-cycle (2-regular graph) zeroes the
  degree variance — den = 0 must guard to assortativity 0.0, never
  NULL/NaN.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()

_EPOCH = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ev(event_id, hour_off, minute, etype, value):
    ts = _EPOCH + dt.timedelta(hours=hour_off, minutes=minute)
    return (event_id, ts, event_id % 7, etype, value, "{}")


# 'const': hours 0..29, exactly 2 events/hour -> constant series (vx=0).
# 'short': 5 hourly buckets with varying counts (1,2,3,2,1) -> lag-1
#          pairs exist, lag-24 pairs don't.
# hour 2 of 'short' carries an identical-ts pair (minute 0 twice) for the
# OHLC tie-break pin.
def _events_rows():
    rows = []
    eid = 0
    for h in range(30):
        for k in range(2):
            rows.append(_ev(eid, h, 5 * k, "const", float(h % 3) + 0.25))
            eid += 1
    short_counts = [1, 2, 3, 2, 1]
    for h, c in enumerate(short_counts):
        for k in range(c):
            minute = 0 if (h == 2 and k < 2) else 10 + k
            rows.append(_ev(eid, h, minute, "short", float(eid) / 4.0))
            eid += 1
    return rows


@pytest.fixture(scope="module")
def ts_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("ts_adversarial_sf")
    df = spark.createDataFrame(
        _events_rows(),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


# 3-cycle co-occurrence graph: three 2-supplier orders (1,2) (2,3) (3,1)
# -> every mutual-top-8 degree is exactly 2 -> den = m*sxx - s1^2 = 0.
@pytest.fixture(scope="module")
def cycle_graph_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("cycle_graph_sf")
    rows = [(10, 1), (10, 2), (20, 2), (20, 3), (30, 3), (30, 1)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
    df.coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _run_both(name: str, spark, sf_dir: str, tables: tuple[str, ...]):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    rel = con.sql(q.oracle)
    scols, dcols = sdf.columns, rel.columns
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    )
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted(
        tuple(repr(_norm(r[i])) for i in sidx) for r in sdf.collect()
    )
    drows = sorted(
        tuple(repr(_norm(r[i])) for i in didx) for r in rel.fetchall()
    )
    con.close()
    return srows, drows


def test_autocorr_constant_series_guard_parity(spark, ts_fixture_sf):
    srows, drows = _run_both(
        "ts_autocorr_lag", spark, ts_fixture_sf, ("events",)
    )
    assert srows == drows, (
        f"first diff: "
        f"{next(((a, b) for a, b in zip(srows, drows) if a != b), None)}"
    )
    out = {
        (r["event_type"], r["lag"]): r
        for r in REGISTRY["ts_autocorr_lag"]
        .fn(spark, ts_fixture_sf)
        .collect()
    }
    # constant series: variance 0 -> the guard must yield exactly 0.0
    assert out[("const", 1)]["vx"] == 0
    assert out[("const", 1)]["autocorr"] == 0.0
    assert out[("const", 24)]["autocorr"] == 0.0
    # 5-bucket series: lag-1 present, lag-24 row must not exist
    assert ("short", 1) in out
    assert ("short", 24) not in out


def test_seasonal_naive_gap_and_constant_parity(spark, ts_fixture_sf):
    srows, drows = _run_both(
        "ts_seasonal_naive", spark, ts_fixture_sf, ("events",)
    )
    assert srows == drows
    out = {
        r["event_type"]: r
        for r in REGISTRY["ts_seasonal_naive"]
        .fn(spark, ts_fixture_sf)
        .collect()
    }
    # 'short' has no hour with a 24h-earlier bucket -> absent, not 0/0
    assert "short" not in out
    # constant series forecasts itself exactly
    assert out["const"]["n_eval"] == 6
    assert out["const"]["sae"] == 0
    assert out["const"]["mae"] == 0.0


def test_ohlc_identical_timestamp_tiebreak_parity(spark, ts_fixture_sf):
    srows, drows = _run_both(
        "ts_resample_ohlc", spark, ts_fixture_sf, ("events",)
    )
    assert srows == drows
    rows = (
        REGISTRY["ts_resample_ohlc"]
        .fn(spark, ts_fixture_sf)
        .where("event_type = 'short'")
        .collect()
    )
    by_hour = {r["hour"].hour: r for r in rows}
    # hour 2 has two events at the IDENTICAL ts: ids 63,64 (values
    # 15.75, 16.0) then id 65 at minute 12 (16.25). open = value of the
    # smaller event_id at the tied ts; close = the later-minute event.
    h2 = by_hour[2]
    assert h2["volume"] == 3
    assert h2["open"] == 63 / 4.0
    assert h2["close"] == 65 / 4.0


def test_assortativity_regular_graph_guard_parity(spark, cycle_graph_sf):
    srows, drows = _run_both(
        "graph_degree_assortativity", spark, cycle_graph_sf, ("lineitem",)
    )
    assert srows == drows
    row = (
        REGISTRY["graph_degree_assortativity"]
        .fn(spark, cycle_graph_sf)
        .collect()[0]
    )
    # 3-cycle: 6 directed edge instances, all degrees 2
    assert row["m"] == 6
    assert row["s1"] == 12
    assert row["den"] == 0
    assert row["assortativity"] == 0.0  # guarded, never NULL/NaN


# --------------------------------------------------------------------------
# ts_lttb_downsample adversarial shapes (round-8 session):
# * a series SHORTER than B = 16 points must emit ZERO rows in both
#   engines (the n >= 16 guard, unreachable on generated testdata);
# * a FLAT series (constant y) zeroes every triangle area — all picks
#   tie at area2m = 0 and must break to the SMALLEST hour per bucket.


@pytest.fixture(scope="module")
def lttb_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("lttb_adversarial_sf")
    rows = []
    eid = 0
    # flat series: 40 hours, exactly 3 events per hour -> every area 0
    for h in range(40):
        for k in range(3):
            rows.append(_ev(eid, h, 7 + k, "flat", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    # short series: 10 hourly buckets only (< 16 output points)
    s = tmp_path_factory.mktemp("lttb_short_sf")
    short = [
        _ev(1000 + h, h, 3, "s", float(h)) for h in range(10)
    ]
    spark.createDataFrame(
        short,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(s / "events.parquet"))
    return str(d), str(s)


def test_lttb_flat_series_tie_and_short_series_guard(spark, lttb_fixture_sf):
    flat_sf, short_sf = lttb_fixture_sf
    srows, drows = _run_both(
        "ts_lttb_downsample", spark, flat_sf, ("events",)
    )
    assert srows == drows
    assert len(srows) == 16
    # flat series: every interior area2m must be exactly 0 and the
    # tie must break to the smallest hour of each bucket
    sdf = REGISTRY["ts_lttb_downsample"].fn(spark, flat_sf)
    got = {r["k"]: (r["sel_hx"], r["area2m"]) for r in sdf.collect()}
    hx0 = min(hx for hx, _ in got.values())
    n, nb = 40, 14
    for k in range(1, nb + 1):
        lo = 1 + ((k - 1) * (n - 2)) // nb
        assert got[k] == (hx0 + lo, 0), (k, got[k])
    # short series: both engines emit nothing
    srows, drows = _run_both(
        "ts_lttb_downsample", spark, short_sf, ("events",)
    )
    assert srows == drows == []


# --------------------------------------------------------------------------
# ml_kaplan_meier adversarial shapes: the generated testdata has NO
# censored users (everyone purchases), so the censoring branch and the
# censored-at-event-time risk-set convention are pinned here:
# * users with no purchase leave the risk set at their last event;
# * a censored duration EQUAL to an event duration keeps the censored
#   user at risk at that time (counted in n_risk, not in d);
# * a final event time where every remaining user converts drives the
#   integer survival to exactly 0.


@pytest.fixture(scope="module")
def km_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("km_adversarial_sf")
    rows = []
    # users 0..3 purchase at hours 2, 2, 5, 5 after their first event
    for u, ph in ((0, 2), (1, 2), (2, 5), (3, 5)):
        rows.append(_ev(100 + 10 * u, 0, 0, "view", 1.0))
        rows[-1] = rows[-1][:2] + (u,) + rows[-1][3:]
        rows.append(_ev(101 + 10 * u, ph, 0, "purchase", 1.0))
        rows[-1] = rows[-1][:2] + (u,) + rows[-1][3:]
    # user 4: censored at hour 2 (same time as an event step, no purchase)
    rows.append(_ev(900, 0, 0, "view", 1.0)[:2] + (4,) + ("view", 1.0, "{}"))
    rows.append(_ev(901, 2, 0, "click", 1.0)[:2] + (4,) + ("click", 1.0, "{}"))
    # user 5: censored at hour 9 (after every event time)
    rows.append(_ev(910, 0, 0, "view", 1.0)[:2] + (5,) + ("view", 1.0, "{}"))
    rows.append(_ev(911, 9, 0, "click", 1.0)[:2] + (5,) + ("click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_kaplan_meier_censoring_parity(spark, km_fixture_sf):
    srows, drows = _run_both(
        "ml_kaplan_meier", spark, km_fixture_sf, ("events",)
    )
    assert srows == drows
    rows = {
        int(r["t"]): (int(r["n_risk"]), int(r["d"]), int(r["s_fx"]))
        for r in REGISTRY["ml_kaplan_meier"].fn(spark, km_fixture_sf)
        .collect()
    }
    fx = 1 << 30
    # t=2: all 6 at risk (censored-at-2 user counted), 2 events
    assert rows[2] == (6, 2, (fx * 4) // 6)
    # t=5: users 2,3 and the t=9 censored user remain -> 3 at risk
    s2 = (((fx * 4) // 6) * 1) // 3
    assert rows[5] == (3, 2, s2)
    assert sorted(rows) == [2, 5]
