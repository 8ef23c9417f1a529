from vct.serve.deployment import (  # noqa: F401
    classify_and_display,
    classify_videos,
    construct_url,
    load_model,
    post_results,
)
from vct.serve.queue import QueuePull, QueuePush  # noqa: F401
from vct.serve.store import ResultStore  # noqa: F401
