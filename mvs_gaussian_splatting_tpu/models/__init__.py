from .gaussians import (GaussianAux, GaussianParams, activated, init_from_pcd,  # noqa: F401
                        num_alive, pad_capacity)
from .densify import (DensifyConfig, add_densification_stats,  # noqa: F401
                      densify_and_prune, reset_opacity)
from . import ply  # noqa: F401
