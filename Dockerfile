# TPU-VM / CPU image for sug_tpu (the reference ships a CUDA 11.1 torch
# image; the TPU equivalent just needs jax[tpu] + the science stack).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /sug_tpu
COPY requirements.txt .
# On a TPU VM replace with: pip install 'jax[tpu]' -f \
#   https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -r requirements.txt

COPY . .
RUN make native

CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
