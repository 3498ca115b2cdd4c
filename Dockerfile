# wdbx-tpu serving container.
# For TPU VMs use a jax[tpu]-enabled base; this default builds the
# CPU-backend image (same compiled programs, fake multi-device via
# XLA_FLAGS if desired).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY wdbx_tpu ./wdbx_tpu
COPY config ./config
RUN pip install --no-cache-dir -e . \
    && make -C wdbx_tpu/native

ENV WDBX_DATA_DIR=/data \
    WDBX_API_HOST=0.0.0.0 \
    WDBX_API_PORT=8000
VOLUME /data
EXPOSE 8000

CMD ["python", "-m", "wdbx_tpu.cli", "--data-dir", "/data", "serve"]
