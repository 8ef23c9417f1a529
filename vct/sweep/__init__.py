from vct.sweep.runner import SweepRunner  # noqa: F401
from vct.sweep.space import normalize_space  # noqa: F401
from vct.sweep.store import SweepStore, is_config_duplicate  # noqa: F401
from vct.sweep.strategies import (  # noqa: F401
    STRATEGIES,
    bayesian_optimization,
    genetic_algorithm,
    grid_search,
)
