from gstk_tpu.parallel.mesh import (
    data_parallel_train_step,
    get_mesh,
    initialize_distributed,
)

__all__ = ["get_mesh", "data_parallel_train_step", "initialize_distributed"]
