# TikTok crawler (C31 counterpart of medsos_lrcn/build/crawler.dockerfile:
# firefox-esr + geckodriver + playwright).
FROM python:3.12-slim

WORKDIR /app
RUN pip install --no-cache-dir requests beautifulsoup4 pandas playwright \
    && playwright install --with-deps firefox

COPY vct/core /app/vct/core
COPY vct/serve/__init__.py vct/serve/tiktok.py vct/serve/crawler.py \
     vct/serve/store.py vct/serve/queue.py vct/serve/deployment.py /app/vct/serve/
COPY vct/__init__.py /app/vct/

ENV APP_STAGE=prod VIDEO_DIR=/videos
# profile_urls.txt mounted at /app/profile_urls.txt
CMD ["python", "-m", "vct.serve.crawler"]
