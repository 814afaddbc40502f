"""Dashboard serving layer — the reference's two Streamlit apps as
thin consumers of the gold parquet this engine writes (the gold
contract, reference README.md:11). All analytics live in
``app.data`` (headless-testable Spark queries); the ``streamlit_*``
modules only render."""
