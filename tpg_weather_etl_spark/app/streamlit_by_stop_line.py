"""By-stop-line dashboard (reference app/streamlit_by_stop_line.py)
as a thin renderer over ``app.data``: sidebar filters, KPI row,
per-stop metric time series, hour×day delay heatmap, details table.

Run with:
``streamlit run tpg_weather_etl_spark/app/streamlit_by_stop_line.py``
"""

from __future__ import annotations

import os


def _spark():
    from tpg_weather_etl_spark.session import get_spark
    return get_spark(app_name="dashboard-by-stop-line")


def main() -> None:
    try:
        import streamlit as st
    except ImportError as e:  # pragma: no cover - UI-only path
        raise RuntimeError(
            "streamlit is not installed; the dashboard analytics are "
            "available headlessly via tpg_weather_etl_spark.app.data"
        ) from e

    from tpg_weather_etl_spark.app import data as D

    st.set_page_config(page_title="TPG — By stop × line", layout="wide")
    st.title("TPG Delays — by stop × line")

    with st.sidebar:
        st.header("Data")
        gold_path = st.text_input(
            "Gold parquet (features_by_stop_line)",
            value=os.environ.get("BY_STOP_LINE_PATH",
                                 "data/gold/features_by_stop_line"))

    spark = _spark()
    gold = D.enhance_time(spark.read.parquet(gold_path))

    with st.sidebar:
        st.header("Filters")
        lines = D.line_options(gold)
        line_sel = st.multiselect("Line(s)", lines,
                                  default=lines[:1] if lines else [])
        stops = D.stop_options(gold, line_sel)
        name_for = dict(stops)
        stop_sel = st.multiselect(
            "Stop(s)", [k for k, _ in stops],
            default=[stops[0][0]] if stops else [],
            format_func=lambda k: name_for.get(k, str(k)))
        bounds = gold.agg({"date": "min"}).collect()[0][0], \
            gold.agg({"date": "max"}).collect()[0][0]
        dr = st.date_input("Date range", value=bounds,
                           min_value=bounds[0], max_value=bounds[1])
        metric = st.selectbox(
            "Metric", list(D.METRIC_LABELS),
            format_func=lambda k: D.METRIC_LABELS.get(k, k))

    view = D.filter_view(
        gold, lines=line_sel, stop_keys=stop_sel,
        date_range=dr if isinstance(dr, tuple) and len(dr) == 2 else None)

    kpis = D.kpi_row(view)
    cols = st.columns(4)
    cols[0].metric("Trips", f"{int(kpis['trips'] or 0):,}")
    cols[1].metric("Avg delay (min)",
                   f"{(kpis['avg_delay_min'] or 0):.2f}")
    cols[2].metric("P90 delay (min)",
                   f"{(kpis['p90_delay_min'] or 0):.2f}")
    cols[3].metric("Share ≥2min",
                   f"{100 * (kpis['share_late_ge2'] or 0):.1f}%")
    st.divider()

    st.subheader(f"Time series — {D.METRIC_LABELS.get(metric, metric)}")
    ts = D.timeseries(view, metric).toPandas()
    if ts.empty:
        st.info("Not enough data for time series.")
    else:
        st.line_chart(ts, x="sched_bin", y="value", color="stop_name")

    st.subheader("Hour × Day heatmap (avg delay)")
    heat = D.heatmap_hour_dow(view).toPandas()
    if heat.empty:
        st.info("Not enough data for heatmap.")
    else:
        st.dataframe(
            heat.pivot(index="dow", columns="hour",
                       values="delay_avg_min"),
            use_container_width=True)

    st.subheader("Details")
    st.dataframe(
        view.orderBy("sched_bin", "line_text", "stop_key")
        .limit(1000).toPandas())


if __name__ == "__main__":  # pragma: no cover
    main()
