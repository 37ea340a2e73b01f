"""Streamlit frontend at the repo root (reference ui.py parity):
`streamlit run ui.py` with API_URL pointing at the serving API.
The zero-dependency HTML UI is served by the API itself at GET /."""

from hybridsearch_tpu.api.webui import streamlit_app

streamlit_app()
