# Queue inference worker on a TPU VM (C31 counterpart of
# medsos_lrcn/build/worker.dockerfile, which was CUDA 12.2 + torch;
# this tier runs JAX on TPU).
FROM python:3.12-slim

WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 g++ libavcodec-dev libavformat-dev libswscale-dev \
        && rm -rf /var/lib/apt/lists/*
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint einops \
        opencv-python-headless h5py requests beautifulsoup4

COPY vct /app/vct
# native tier (optional, builds on first use): mmap clip cache + ffmpeg decoder
COPY native /app/native

# worker.py:24-28 env surface
ENV MODEL_PATH=/models/prod \
    SAMPLING_METHOD=uniform \
    SEQUENCE_LENGTH=60 \
    VIDEO_DIR=/videos \
    QUEUE_PORT=54000 \
    APP_STAGE=prod
# also honored: BACKEND_URL (backend base url), VCT_WORKER_MESH=1 (shard
# inference over all local TPU chips)
EXPOSE 54000
CMD ["python", "-m", "vct.serve.worker"]
