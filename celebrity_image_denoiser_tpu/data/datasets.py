"""Dataset pairing and splits.

Reproduces the reference's disk layout contract
(``Dataset_Noise/<noise_type>/<person>/<img>`` paired with
``Clean_dataset/<person>/<img>``, training.py:114-148 / preprocessing.py:
19-31) including the sklearn 80/20 split with random_state=42, plus the
TPU-native alternative: a clean-only dataset with on-device noise injection
(no pre-rendered noisy copies at all).

Bad files follow the reference's warn-and-skip contract (training.py:170-179
returns None and collates it away) — here they are filtered at batch assembly
with a logged warning; nothing is ever deleted from disk (unlike
sr_ganpreprocess.py:34-41, which the reference uses to *delete* corrupt
files — reproduced only behind an explicit flag in cli/noise_gen).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from celebrity_image_denoiser_tpu.data import imageio
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.data")


def collect_pairs(
    noisy_base_dir: str,
    clean_dir: str,
    noise_types: Sequence[str],
) -> List[Tuple[str, str]]:
    """All (noisy_path, clean_path) pairs across noise types, walking
    exactly like DenoiseDataset (training.py:124-140)."""
    all_pairs: List[Tuple[str, str]] = []
    for noise_type in noise_types:
        noise_dir = os.path.join(noisy_base_dir, noise_type)
        if not os.path.exists(noise_dir):
            logger.warning("Noise directory %s does not exist.", noise_dir)
            continue
        for person_dir in sorted(os.listdir(noise_dir)):
            person_noise_dir = os.path.join(noise_dir, person_dir)
            person_clean_dir = os.path.join(clean_dir, person_dir)
            if os.path.isdir(person_noise_dir) and os.path.exists(person_clean_dir):
                for filename in sorted(os.listdir(person_noise_dir)):
                    if filename.lower().endswith(imageio.IMAGE_EXTS):
                        noisy_path = os.path.join(person_noise_dir, filename)
                        clean_path = os.path.join(person_clean_dir, filename)
                        if os.path.exists(clean_path):
                            all_pairs.append((noisy_path, clean_path))
    return all_pairs


def train_test_split_pairs(pairs: List, test_split: float = 0.2, seed: int = 42):
    """80/20 split; uses sklearn with random_state=seed for bit-exact parity
    with the reference (training.py:144) when sklearn is present, otherwise
    an equivalent shuffled split."""
    if not pairs:
        raise ValueError("No valid image pairs found. Check dataset paths and files.")
    try:
        from sklearn.model_selection import train_test_split

        return train_test_split(pairs, test_size=test_split, random_state=seed)
    except ImportError:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(pairs))
        n_test = int(round(len(pairs) * test_split))
        test = [pairs[i] for i in idx[:n_test]]
        train = [pairs[i] for i in idx[n_test:]]
        return train, test


def train_val_test_split(items: List, train_split: float = 0.8,
                         val_split: float = 0.1, seed: Optional[int] = None):
    """80/10/10 three-way split — the cGAN trainer's ``split_dataset``
    (training5Pbar.py:131-141): an 80/20 first cut, then the remainder split
    val-vs-test at val_split/(1-train_split).  The reference passes
    ``random_state=None`` (a different split every run); pass a seed for
    reproducibility."""
    if not items:
        raise ValueError("Dataset is empty. Cannot split.")
    try:
        from sklearn.model_selection import train_test_split as _tts

        train, temp = _tts(items, train_size=train_split, random_state=seed)
        val, test = _tts(temp, train_size=val_split / (1 - train_split),
                         random_state=seed)
        return train, val, test
    except ImportError:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(items))
        n_tr = int(round(len(items) * train_split))
        n_val = int(round(len(items) * val_split))
        pick = lambda sl: [items[i] for i in sl]  # noqa: E731
        return (pick(idx[:n_tr]), pick(idx[n_tr:n_tr + n_val]),
                pick(idx[n_tr + n_val:]))


class PairedImageDataset:
    """Noisy/clean pairs from disk, normalized to [-1,1] float32 NHWC.

    __getitem__ returns (noisy, clean) float32 HWC or None on decode error
    (the reference's None-and-filter contract)."""

    def __init__(
        self,
        noisy_base_dir: str,
        clean_dir: str,
        noise_types: Sequence[str] = ("gaussian", "salt_pepper", "speckle", "poisson", "uniform"),
        image_size: Optional[Tuple[int, int]] = None,
        noisy_size: Optional[Tuple[int, int]] = None,
        clean_size: Optional[Tuple[int, int]] = None,
        test_split: float = 0.2,
        split_seed: int = 42,
        normalize: bool = True,
    ):
        """``image_size`` resizes both sides; for the SRGAN LR/HR layout
        (noisy 64², clean 256² — SRGANDataset, sr_ganTrainGNew.py:96-154,
        where sizes are baked in by preprocessing) pass distinct
        ``noisy_size``/``clean_size`` or None to load files as-is."""
        pairs = collect_pairs(noisy_base_dir, clean_dir, noise_types)
        self.image_pairs, self.test_image_pairs = train_test_split_pairs(
            pairs, test_split, split_seed
        )
        logger.info(
            "Loaded %d training image pairs and %d test image pairs.",
            len(self.image_pairs), len(self.test_image_pairs),
        )
        self.noisy_size = noisy_size or image_size
        self.clean_size = clean_size or image_size
        self.normalize = normalize

    def __len__(self):
        return len(self.image_pairs)

    def _load(self, path: str, hw: Optional[Tuple[int, int]]) -> np.ndarray:
        size = None if hw is None else (hw[1], hw[0])
        arr = imageio.to_float01(imageio.imread_rgb(path, size))
        if self.normalize:
            arr = imageio.normalize(arr)
        return arr

    def __getitem__(self, idx: int):
        noisy_path, clean_path = self.image_pairs[idx]
        try:
            return (self._load(noisy_path, self.noisy_size),
                    self._load(clean_path, self.clean_size))
        except Exception as e:  # warn-and-skip contract
            logger.warning("Error loading images: %s, %s. Error: %s",
                           noisy_path, clean_path, e)
            return None

    # -- native fast path (data/native.py): decode-only here; resize +
    # normalize + batch assembly run in the C++ thread pool ------------------
    @property
    def raw_batch_spec(self):
        if self.noisy_size is None or self.clean_size is None:
            return None  # variable sizes -> python path
        m, s = (0.5, 0.5) if self.normalize else (0.0, 1.0)
        return [(self.noisy_size, m, s), (self.clean_size, m, s)]

    def raw(self, idx: int):
        """Decoded uint8 HWC pair (no resize/normalize), or None."""
        noisy_path, clean_path = self.image_pairs[idx]
        try:
            return (imageio.imread_rgb(noisy_path, None),
                    imageio.imread_rgb(clean_path, None))
        except Exception as e:
            logger.warning("Error loading images: %s, %s. Error: %s",
                           noisy_path, clean_path, e)
            return None

    def get_test(self, idx: int):
        noisy_path, clean_path = self.test_image_pairs[idx]
        return (self._load(noisy_path, self.noisy_size),
                self._load(clean_path, self.clean_size))


class CleanImageDataset:
    """Clean images only — the TPU-native path where noise is injected on
    device per batch (data.noise.random_noise_batch) instead of being
    pre-rendered to disk."""

    def __init__(
        self,
        clean_dir: str,
        image_size: Optional[Tuple[int, int]] = (256, 256),
        test_split: float = 0.2,
        split_seed: int = 42,
        normalize: bool = False,
    ):
        """``normalize=True`` returns [-1,1] (the tanh families' training
        domain) instead of [0,1] — keep normalization here rather than in a
        wrapper so the pipeline's native fast path can see it."""
        paths = imageio.list_images(clean_dir)
        if not paths:
            raise ValueError(f"No images found under {clean_dir}")
        self.train_paths, self.test_paths = train_test_split_pairs(
            paths, test_split, split_seed
        )
        self.image_size = image_size
        self.normalize = normalize

    def __len__(self):
        return len(self.train_paths)

    def __getitem__(self, idx: int):
        size = None if self.image_size is None else (self.image_size[1], self.image_size[0])
        try:
            arr = imageio.to_float01(imageio.imread_rgb(self.train_paths[idx], size))
            return imageio.normalize(arr) if self.normalize else arr
        except Exception as e:
            logger.warning("Error loading %s: %s", self.train_paths[idx], e)
            return None

    # -- native fast path ------------------------------------------------------
    @property
    def raw_batch_spec(self):
        if self.image_size is None:
            return None
        m, s = (0.5, 0.5) if self.normalize else (0.0, 1.0)
        return [(self.image_size, m, s)]

    def raw(self, idx: int):
        try:
            return imageio.imread_rgb(self.train_paths[idx], None)
        except Exception as e:
            logger.warning("Error loading %s: %s", self.train_paths[idx], e)
            return None
