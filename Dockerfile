# hybridsearch_tpu API image (reference ships python-slim + uvicorn,
# Dockerfile:36; here the stdlib server needs no extra deps — install the
# `api` extra for fastapi/uvicorn).
FROM python:3.11-slim

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml README.md ./
COPY hybridsearch_tpu ./hybridsearch_tpu
COPY native ./native
COPY bench.py ./
# trained bi-/cross-encoder checkpoints (models/minilm.py resolves
# ./models at runtime) — serving starts on real learned weights
COPY models ./models

# CPU jax by default; swap for the TPU wheel on TPU VMs:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir . && make -C native

ENV HST_DB=/data/hybridsearch.db
ENV LOG_LEVEL=info
VOLUME /data
EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
  CMD python -c "import urllib.request,sys;sys.exit(0 if urllib.request.urlopen('http://localhost:8000/health',timeout=4).status==200 else 1)"

CMD ["sh", "-c", "python -m hybridsearch_tpu --db $HST_DB serve --host 0.0.0.0 --port 8000"]
