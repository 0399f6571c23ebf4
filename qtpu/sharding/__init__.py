from qtpu.sharding.mesh import make_mesh  # noqa: F401
from qtpu.sharding.specs import batch_spec, param_specs, shard_params  # noqa: F401
