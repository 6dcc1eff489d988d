# highresnet_tpu — TPU-native multi-frame super-resolution.
#
# Capability parity with the reference's CUDA Dockerfile (Dockerfile:1-50),
# retargeted at Cloud TPU hosts: official JAX TPU wheels instead of
# torch+CUDA. Build on a TPU VM (v5e and newer).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY highresnet_tpu/ highresnet_tpu/
COPY configs/ configs/
COPY examples/ examples/
COPY bench.py .

ENV PYTHONPATH=/app

# Precompute clearance scores, then train (same default pipeline as the
# reference's CMD).
CMD ["sh", "-c", "python -m highresnet_tpu.cli.save_clearance --prefix data/ && python -m highresnet_tpu.cli.train --config configs/config.json"]
