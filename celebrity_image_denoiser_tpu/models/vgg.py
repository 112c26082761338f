"""VGG16 feature extractor for perceptual loss.

The reference's ``VGGPerceptualLoss`` (training.py:101-111,
sr_ganTrainGNew.py:83-93) is MSE over frozen torchvision
``vgg16.features[:16]`` activations (through relu3_3).  This is the same
architecture in NHWC; weights come from the .pth importer
(ckpt/torch_import.py) when a torchvision checkpoint is available, otherwise
random init (the loss is still a valid trainable perceptual metric, just not
ImageNet-pretrained — the container has no network egress to fetch weights).
"""

from __future__ import annotations

from celebrity_image_denoiser_tpu import nn


class VGGFeatures(nn.Module):
    """vgg16.features[:16]: conv1_1..relu3_3, children indexed like
    torchvision so imported ``features.<i>.weight`` keys line up."""

    def __init__(self):
        super().__init__()
        cfg = [
            (0, nn.Conv2d(3, 64, 3, padding=1)), (1, nn.ReLU()),
            (2, nn.Conv2d(64, 64, 3, padding=1)), (3, nn.ReLU()),
            (4, nn.MaxPool2d(2, 2)),
            (5, nn.Conv2d(64, 128, 3, padding=1)), (6, nn.ReLU()),
            (7, nn.Conv2d(128, 128, 3, padding=1)), (8, nn.ReLU()),
            (9, nn.MaxPool2d(2, 2)),
            (10, nn.Conv2d(128, 256, 3, padding=1)), (11, nn.ReLU()),
            (12, nn.Conv2d(256, 256, 3, padding=1)), (13, nn.ReLU()),
            (14, nn.Conv2d(256, 256, 3, padding=1)), (15, nn.ReLU()),
        ]
        seq = nn.Sequential()
        for idx, layer in cfg:
            seq.add(str(idx), layer)
        self.add("slice", seq)

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("slice", params, state, ns, x, train=False)
        return y, ns
