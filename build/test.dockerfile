# Test image (C31 counterpart of medsos_lrcn/build/test.dockerfile): the full
# framework + pytest, CPU backend with a virtual 8-device mesh.
FROM python:3.12-slim

WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir jax flax optax orbax-checkpoint einops \
        opencv-python-headless h5py scikit-learn requests beautifulsoup4 \
        nltk pytest torch --index-url https://download.pytorch.org/whl/cpu

COPY . /app

ENV JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    VCT_TEST_REEXEC=1
CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
