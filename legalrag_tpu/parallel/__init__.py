from legalrag_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    local_devices,
    make_mesh,
    replicated,
    row_sharded,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharded", "local_devices", "make_mesh",
    "replicated", "row_sharded",
]
