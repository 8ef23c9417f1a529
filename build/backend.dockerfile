# REST backend (C31 counterpart of medsos_lrcn/build/backend.dockerfile).
# Stdlib HTTP + sqlite store — no torch/flask/mongo needed on this tier.
FROM python:3.12-slim

WORKDIR /app
COPY vct/core /app/vct/core
COPY vct/serve/__init__.py vct/serve/store.py vct/serve/queue.py vct/serve/backend.py /app/vct/serve/
COPY vct/__init__.py /app/vct/
RUN pip install --no-cache-dir requests

ENV APP_STAGE=prod
EXPOSE 5000
# run:  docker run --network backend-network -p 5000:5000 vct-backend
CMD ["python", "-m", "vct.serve.backend"]
