from .mesh import AXIS_DATA, AXIS_MODEL, data_sharding, make_mesh, replicated  # noqa: F401
from .sharding import param_pspecs, param_shardings, shard_params  # noqa: F401
