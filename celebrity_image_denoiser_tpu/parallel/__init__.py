from celebrity_image_denoiser_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharding,
)
from celebrity_image_denoiser_tpu.parallel import collectives  # noqa: F401
from celebrity_image_denoiser_tpu.parallel.dataparallel import (  # noqa: F401
    data_parallel_apply,
    shard_batch,
    replicate,
)
from celebrity_image_denoiser_tpu.parallel import tiling  # noqa: F401
from celebrity_image_denoiser_tpu.parallel.tiling import (  # noqa: F401
    tiled_apply,
    spatial_sharded_apply,
)
