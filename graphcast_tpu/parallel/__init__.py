from graphcast_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    fieldset_sharding,
    shard_fieldsets,
    replicate,
)
