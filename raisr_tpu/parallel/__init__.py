from raisr_tpu.parallel.sharding import (
    make_mesh,
    process_batch_dp,
    process_plane_row_sharded,
    process_batch_2d,
    HR_HALO,
)

__all__ = [
    "make_mesh",
    "process_batch_dp",
    "process_plane_row_sharded",
    "process_batch_2d",
    "HR_HALO",
]
