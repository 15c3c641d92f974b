from .preprocess import CameraView, Processed, preprocess  # noqa: F401
from .raster_ref import rasterize_reference  # noqa: F401
from .rasterize import rasterize  # noqa: F401
from .knn import mean_sq_dist_to_knn  # noqa: F401
