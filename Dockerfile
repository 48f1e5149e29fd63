# LegalRAG-TPU serving image.
# Parity with the reference Dockerfile (build-time index bake + uvicorn on
# 7860); here: native hostops build + index build, stdlib HTTP server.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY legalrag_tpu ./legalrag_tpu
COPY scripts ./scripts
COPY native ./native
COPY ui ./ui
COPY data/raw ./data/raw
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir jax numpy pydantic jieba pytest

# native host ops
RUN make -C native

# bake corpora + indexes + graphs at build time (CPU), then assert
RUN python -m scripts.preprocess_law && \
    python -m scripts.build_index && \
    python -m scripts.build_graph && \
    python -c "import pathlib, sys; \
        ok = all(pathlib.Path(f'data/index/{l}/manifest.json').exists() \
                 for l in ('zh', 'en')); sys.exit(0 if ok else 1)"

ENV PORT=7860
EXPOSE 7860
CMD ["python", "-m", "legalrag_tpu.api.server"]
