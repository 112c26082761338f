from celebrity_image_denoiser_tpu.data.noise import (  # noqa: F401
    add_noise,
    random_noise_batch,
    NOISE_TYPES,
)
from celebrity_image_denoiser_tpu.data.datasets import (  # noqa: F401
    PairedImageDataset,
    CleanImageDataset,
    train_test_split_pairs,
    train_val_test_split,
)
from celebrity_image_denoiser_tpu.data.synthetic import synth_clean_batch  # noqa: F401
from celebrity_image_denoiser_tpu.data.pipeline import DataPipeline  # noqa: F401
from celebrity_image_denoiser_tpu.data import imageio  # noqa: F401
