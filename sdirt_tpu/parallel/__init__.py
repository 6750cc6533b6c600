from .mesh import make_mesh, shard_batch  # noqa: F401
from .steps import make_sharded_dfdp_step, make_sharded_psfnet_step  # noqa: F401
