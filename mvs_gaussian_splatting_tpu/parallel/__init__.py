from .mesh import make_mesh  # noqa: F401
from .data_parallel import make_batch_train_step  # noqa: F401
from .tile_parallel import make_tile_sharded_composite  # noqa: F401
from .tile_stream import make_tile_sharded_stream  # noqa: F401
