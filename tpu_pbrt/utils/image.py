"""Image IO + quality metrics (SSIM/RMSE golden-image comparison,
SURVEY.md §4.2/§4.5 — the test strategy the reference lacks)."""

from __future__ import annotations

import numpy as np


def write_png(path: str, rgb8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG (PIL, baked into the image)."""
    from PIL import Image

    Image.fromarray(np.asarray(rgb8), "RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM with an 8x8 uniform window (classic Wang et al. 2004 with a
    box filter; no scipy dependency). Inputs (H, W) or (H, W, C) float."""
    return float(np.mean(ssim_map(a, b, data_range)))


def ssim_map(a: np.ndarray, b: np.ndarray,
             data_range: float = 1.0) -> np.ndarray:
    """Per-window local SSIM map (H-7, W-7), channel-averaged — shows
    WHERE a comparison loses (geometry mismatch vs noise vs tone)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return np.mean([ssim_map(a[..., c], b[..., c], data_range)
                        for c in range(a.shape[-1])], axis=0)

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = 8

    def box(x):
        c = np.cumsum(np.cumsum(x, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        s = (c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win])
        return s / (win * win)

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a ** 2
    var_b = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return num / den
