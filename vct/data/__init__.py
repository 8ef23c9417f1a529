from vct.data.batcher import batches, train_test_split  # noqa: F401
from vct.data.ingest import (  # noqa: F401
    build_dataset_cache,
    load_dataset_inference,
    load_dataset_simple,
    load_or_build_dataset,
)
from vct.data.samplers import SAMPLERS, sample_frames  # noqa: F401
from vct.data.synthetic import generate_dummy_data  # noqa: F401
