from celebrity_image_denoiser_tpu.viz.analysis import make_graphs, fig_to_base64  # noqa: F401
from celebrity_image_denoiser_tpu.viz.training_plots import plot_metrics  # noqa: F401
from celebrity_image_denoiser_tpu.viz.side_by_side import (  # noqa: F401
    combine_test_images,
    triptych,
)
