from celebrity_image_denoiser_tpu.ckpt.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
from celebrity_image_denoiser_tpu.ckpt.torch_import import (  # noqa: F401
    import_torch_state_dict,
    load_pth_safely,
)
from celebrity_image_denoiser_tpu.ckpt.keras_import import load_keras_model  # noqa: F401
from celebrity_image_denoiser_tpu.ckpt.export import (  # noqa: F401
    export_torch_state_dict,
    save_pth,
    export_keras_cgan,
)
