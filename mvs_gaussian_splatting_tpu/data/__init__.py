from .cameras import Camera, camera_to_json  # noqa: F401
from .readers import SceneInfo, read_scene  # noqa: F401
