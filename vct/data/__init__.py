from vct.data.batcher import batches, train_test_split  # noqa: F401
from vct.data.synthetic import generate_dummy_data  # noqa: F401
