"""Headless smoke of the dashboard serving layer: every analytic the
two Streamlit apps render, driven end-to-end against features built
by this engine (the gold contract). The UI modules themselves import
without streamlit and fail with a clear message only when run."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from tpg_weather_etl_spark.app import data as D
from tpg_weather_etl_spark.features.by_stop_line import (
    build_features_by_stop_line,
)
from tpg_weather_etl_spark.features.events import build_features_events

from test_features import T0, _ev, _mk_events, _mk_weather


@pytest.fixture(scope="module")
def feats(spark):
    ev = _mk_events(spark, [
        _ev(minute=0, delay_s=0),
        _ev(minute=10, delay_s=180),
        _ev(minute=10, delay_s=300, line="14", stop="8502"),
        _ev(minute=20, delay_s=60, arr_only=True),
    ])
    return build_features_events(
        ev, _mk_weather(spark), station_id="GVE").cache()


def test_latest_events_ordering_and_delay(spark):
    ev = _mk_events(spark, [
        _ev(minute=0, delay_s=0), _ev(minute=10, delay_s=180),
        _ev(minute=5, delay_s=60, op="SBB"),      # filtered out
    ])
    out = D.load_latest_events(ev, limit=10).collect()
    assert [r.delay_sec for r in out] == [180, 0]  # newest first
    assert out[0].delay_min == pytest.approx(3.0)


def test_feature_sample_reproducible(spark, feats):
    a = [r.sched_ts for r in D.feature_sample(feats, n=3, seed=7).collect()]
    b = [r.sched_ts for r in D.feature_sample(feats, n=3, seed=7).collect()]
    assert a == b and len(a) == 3


def test_kpis_missing_and_coalescing(feats):
    k = D.compute_kpis(feats)
    assert k["rows_total"] == 4
    assert k["both_depart_present"] == 3   # arr_only row lacks depart ts
    assert k["unusable"] == 0
    assert k["pct_any_coalesce"] == pytest.approx(25.0)
    assert k["full_weather_rows"] == 4

    miss = D.missing_values_table(feats, top_n=3)
    assert len(miss) == 3
    # depart columns are the only ones with NA here (1/4 rows)
    assert miss[0][0].startswith("depart_")
    assert miss[0][1] == pytest.approx(25.0)

    coal = {m: (c, p) for m, c, p in D.coalescing_table(feats)}
    assert coal["any_coalesce_from_arrival"] == (1, 25.0)
    assert coal["both_depart_present"][0] == 3


def test_by_stop_line_dashboard_roundtrip(spark, feats):
    gold = D.enhance_time(build_features_by_stop_line(feats))
    assert D.line_options(gold) == ["12", "14"]
    stops = D.stop_options(gold, ["14"])
    assert [s for s, _ in stops] == ["14·8502"]

    view = D.filter_view(
        gold, lines=["12"], stop_keys=None,
        date_range=(T0.date(), T0.date()))
    k = D.kpi_row(view)
    assert k["trips"] == 3
    assert not math.isnan(k["avg_delay_min"])

    ts = D.timeseries(view, "delay_avg_min").collect()
    stamps = [r.sched_bin for r in ts]
    assert stamps == sorted(stamps)
    assert len(ts) == 3 and all(r.n_trips >= 1 for r in ts)

    heat = D.heatmap_hour_dow(view).collect()
    assert len(heat) >= 1
    assert all(0 <= r.hour <= 23 and 0 <= r.dow <= 6 for r in heat)
    assert heat[0].dow == 3  # 2024-02-01 is a Thursday, Monday=0


def test_ui_modules_import_without_streamlit():
    import importlib

    for mod in ("tpg_weather_etl_spark.app.streamlit_app",
                "tpg_weather_etl_spark.app.streamlit_by_stop_line"):
        m = importlib.import_module(mod)
        assert callable(m.main)
        try:
            import streamlit  # noqa: F401
        except ImportError:
            with pytest.raises(RuntimeError, match="streamlit"):
                m.main()
