"""Event-features dashboard (reference app/streamlit_app.py:1-260) as
a thin renderer over ``app.data``: latest events, a reproducible
feature sample, and data-quality panels (KPIs, missing values,
coalescing analysis).

Run with: ``streamlit run tpg_weather_etl_spark/app/streamlit_app.py``
(streamlit is optional and imported lazily; the analytics are in
``app.data`` and covered headlessly by pytest).
"""

from __future__ import annotations

import os


def _spark():
    from tpg_weather_etl_spark.session import get_spark
    return get_spark(app_name="dashboard-events")


def main() -> None:
    try:
        import streamlit as st
    except ImportError as e:  # pragma: no cover - UI-only path
        raise RuntimeError(
            "streamlit is not installed; the dashboard analytics are "
            "available headlessly via tpg_weather_etl_spark.app.data"
        ) from e

    from tpg_weather_etl_spark.app import data as D

    st.set_page_config(page_title="TPG Delay — Event Features",
                       layout="wide")
    st.title("TPG Delay Prediction — Event Features")

    with st.sidebar:
        st.header("Data sources")
        events_path = st.text_input(
            "Events parquet (silver ist_events)",
            value=os.environ.get("IST_EVENTS_PATH", "data/silver/ist"))
        features_path = st.text_input(
            "Features parquet (gold)",
            value=os.environ.get("FEATURES_PATH",
                                 "data/gold/features_events"))

    spark = _spark()

    st.subheader("Latest TPG events")
    events = spark.read.parquet(events_path)
    st.dataframe(D.load_latest_events(events).toPandas(),
                 use_container_width=True)
    st.divider()

    st.subheader("Feature sample (from gold parquet)")
    if not os.path.exists(features_path):
        st.info("Features parquet not found — run the build-features "
                "pipeline first.")
        st.stop()
    features = spark.read.parquet(features_path)
    sample_pd = D.feature_sample(features).toPandas()
    st.dataframe(sample_pd, use_container_width=True)
    st.download_button(
        "Download sample (CSV)",
        sample_pd.to_csv(index=False).encode("utf-8"),
        file_name="features_events_sample.csv", mime="text/csv")
    st.divider()

    st.subheader("Data Quality")
    kpis = D.compute_kpis(features)
    cols = st.columns(5)
    cols[0].metric("Rows", f"{kpis['rows_total']:,}")
    cols[1].metric("Both depart present",
                   f"{kpis['both_depart_present']:,}")
    cols[2].metric("Any coalesce from arrival",
                   f"{kpis['pct_any_coalesce']:.1f}%")
    cols[3].metric("Unusable (sched or est missing)",
                   f"{kpis['unusable']:,}")
    cols[4].metric("Rows with full weather",
                   f"{kpis['full_weather_rows']}")

    left, right = st.columns(2)
    with left:
        st.markdown("**Missing values by column** *(Top-N)*")
        st.dataframe(D.missing_values_table(features),
                     use_container_width=True)
    with right:
        st.markdown("**Coalescing analysis**")
        st.dataframe(D.coalescing_table(features),
                     use_container_width=True)


if __name__ == "__main__":  # pragma: no cover
    main()
