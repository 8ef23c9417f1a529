# Batch deployment CLI on a TPU VM (C31 counterpart of
# medsos_lrcn/build/deployment.dockerfile).
FROM python:3.12-slim

WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 g++ libavcodec-dev libavformat-dev libswscale-dev \
        && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint einops \
        opencv-python-headless h5py requests

COPY vct /app/vct
COPY native /app/native

# example: python -m vct.serve.deployment --model /models/prod --videos /videos \
#            --sampling uniform --sequence_length 60
ENTRYPOINT ["python", "-m", "vct.serve.deployment"]
