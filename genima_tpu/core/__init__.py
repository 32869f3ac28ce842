from genima_tpu.core.config import (  # noqa: F401
    Config,
    apply_overrides,
    instantiate,
    load_config,
    load_yaml,
    merge,
    resolve,
    save_yaml,
)
from genima_tpu.core.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from genima_tpu.core.rng import RngStream, seed_everything  # noqa: F401
