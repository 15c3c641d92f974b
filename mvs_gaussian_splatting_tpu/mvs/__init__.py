from .homography import build_cost_volume, plane_sweep_warp  # noqa: F401
from .model import MVSGaussianModel  # noqa: F401
