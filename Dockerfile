# Container packaging for the TPU-native GLiClass engine.
#
# Replaces the reference's per-model images (reference Dockerfile:13-28, which
# baked a prebuilt binary + ONNX model + prompt_first=false). Here one generic
# image serves any model: the bundle is fetched/converted at first run and
# cached in the mounted volume.
#
#   docker build -t gliclass-tpu .
#   docker run -v /data:/data -v /cache:/root/.cache/gliclass_tpu \
#       gliclass-tpu run /data/job.json --model knowledgator/gliclass-base-v1.0
#
# Long-running serving (SIGTERM shuts down gracefully — docker stop works):
#   docker run -p 8000:8000 -v /cache:/root/.cache/gliclass_tpu gliclass-tpu \
#       serve --model knowledgator/gliclass-base-v1.0 --host 0.0.0.0

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY gliclass ./gliclass
COPY native ./native
COPY tests ./tests
COPY scripts ./scripts

# TPU hosts: swap for the matching jax[tpu] pin of your pod slice.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    optax tokenizers safetensors orbax-checkpoint numpy \
    && pip install --no-cache-dir -e . --no-deps \
    && make -C native

EXPOSE 8000
ENTRYPOINT ["gliclass-tpu"]
