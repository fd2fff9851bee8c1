from taichi_image_tpu.parallel.runtime import (
    CAMERA_AXIS,
    DispatchQueue,
    NullExecutor,
    device_count,
    devices,
    dispatch_queue,
    make_camera_mesh,
    queued,
)
from taichi_image_tpu.parallel.sharding import (
    make_sharded_isp_step,
    replicate,
    shard_cameras,
    sharded_step_for_isp,
)
from taichi_image_tpu.parallel.spatial import (
    ROW_AXIS,
    demosaic_phases_spatial,
    make_spatial_isp_step,
    shard_rows,
)

__all__ = [
    "CAMERA_AXIS", "DispatchQueue", "NullExecutor", "device_count",
    "devices", "dispatch_queue", "make_camera_mesh", "queued",
    "make_sharded_isp_step", "replicate", "shard_cameras",
    "sharded_step_for_isp", "ROW_AXIS", "demosaic_phases_spatial",
    "make_spatial_isp_step", "shard_rows",
]
