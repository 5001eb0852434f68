"""Image I/O and quality metrics (host-side).

Replaces the reference's DirectXTex loaders + swap-chain present
(SURVEY.md §2.3 "DirectXTex / DirectXMesh" row): PNG output is written with
a dependency-free encoder (zlib + struct); texture loading goes through PIL
when available (gated — the environment bans new installs). SSIM implements
the standard Wang et al. metric for the fidelity target in BASELINE.md.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, image: np.ndarray) -> None:
    """Write an (H, W, 3|4) uint8 or float [0,1] array as PNG.
    Uses the native encoder (native/drts_native.cpp) when built."""
    try:
        from .. import native
        if native.write_png(path, image):
            return
    except Exception:
        pass
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + img[row].tobytes() for row in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def load_image(path: str, size: int | None = None) -> np.ndarray | None:
    """Load an image as (H, W, 4) float32 in [0, 1]; optionally resized to
    (size, size). Returns None when PIL is unavailable (textures then fall
    back to material constants, like the reference with missing assets)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    img = Image.open(path).convert("RGBA")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def tonemap_preview(radiance: np.ndarray, exposure: float = 1.0) -> np.ndarray:
    """Quick Reinhard + sRGB preview mapping for debug PNGs."""
    x = np.maximum(np.asarray(radiance, np.float32) * exposure, 0.0)
    x = x / (1.0 + x)
    return np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.power(np.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM (Wang et al. 2004) with an 11x11 Gaussian window, computed
    on the luma of (H, W, 3) images — the BASELINE.md fidelity metric."""
    def luma(x):
        x = np.asarray(x, np.float64)
        return x @ [0.2126, 0.7152, 0.0722] if x.ndim == 3 else x

    x, y = luma(a), luma(b)
    # 11-tap Gaussian, sigma 1.5.
    r = np.arange(11) - 5
    g = np.exp(-(r ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()

    def filt(img):
        img = np.apply_along_axis(
            lambda v: np.convolve(np.pad(v, 5, mode="reflect"), g, "valid"),
            0, img)
        return np.apply_along_axis(
            lambda v: np.convolve(np.pad(v, 5, mode="reflect"), g, "valid"),
            1, img)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    s = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx * mx + my * my + c1) * (sxx + syy + c2))
    return float(s.mean())
