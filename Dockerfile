# Container parity with the reference deployment surface (reference: Dockerfile:1-18 —
# python-slim + dependency install), adapted to this stack: the C++ native layer needs a
# toolchain, and JAX's accelerator plugin (libtpu for Cloud TPU VMs) is provided by the
# host image / extras, so the base here runs the CPU backend out of the box.

FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY pyproject.toml README.md ./
COPY mlvectordb_tpu ./mlvectordb_tpu
COPY native ./native
COPY benchmarks ./benchmarks
COPY examples ./examples

RUN pip install --no-cache-dir . \
    && make -C native

# On a Cloud TPU VM replace with: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=10s --start-period=60s \
    CMD curl -fsS http://localhost:8000/health || exit 1

CMD ["python", "-m", "mlvectordb_tpu.api.server", "--host", "0.0.0.0", "--port", "8000"]
