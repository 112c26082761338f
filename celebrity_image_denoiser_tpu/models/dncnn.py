"""DnCNN — blind-σ residual denoiser (BASELINE.json config 3).

Not present in the reference repo; required by the build targets
(/root/repo/BASELINE.json: "DnCNN-style residual denoiser with skip
connections, blind noise levels σ∈[5,50]").  Standard DnCNN-B layout:
Conv+ReLU, (depth-2)×(Conv+BN+ReLU), Conv; the network predicts the noise
residual and the output is ``x - residual``.
"""

from __future__ import annotations

from celebrity_image_denoiser_tpu import nn


class DnCNN(nn.Module):
    def __init__(self, depth: int = 17, channels: int = 64, image_channels: int = 3):
        super().__init__()
        layers = [nn.Conv2d(image_channels, channels, 3, padding=1), nn.ReLU()]
        for _ in range(depth - 2):
            layers += [
                nn.Conv2d(channels, channels, 3, padding=1, bias=False),
                nn.BatchNorm2d(channels),
                nn.ReLU(),
            ]
        layers.append(nn.Conv2d(channels, image_channels, 3, padding=1, bias=False))
        self.add("body", nn.Sequential(*layers))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        residual = self.call("body", params, state, ns, x, train=train)
        return x - residual, ns
