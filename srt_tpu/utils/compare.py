"""Golden-image comparison: PSNR against the reference's checked-in renders.

The reference's de-facto test strategy is eyeballing the six 500x500
soldier-scene PPMs in ``results/`` (SURVEY §4); BASELINE row 2 turns that
into a number: PSNR > 40 dB at equal spp against reference-matching renders.
This module provides the metric and the harness; ``tools/golden.py`` runs it.

PSNR is computed on 8-bit tonemapped images (the goldens are P3 PPMs of the
reference's sqrt-gamma output, ``Raytracing_n.cpp:853-867``), optionally
after downsampling both sides — box-filtering averages away independent MC
noise, which is the right comparison for two *different* unbiased samplers
of the same integral at finite spp.
"""
from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB between two images (same shape)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def box_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Average `factor`x`factor` blocks (crops any remainder edge)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img = img[:h2 * factor, :w2 * factor].astype(np.float64)
    return img.reshape(h2, factor, w2, factor, -1).mean(axis=(1, 3))


def golden_psnr(render01: np.ndarray, golden_u8: np.ndarray,
                downsample: int = 1) -> dict:
    """Compare a [0,1] tonemapped render against an 8-bit golden.

    Returns ``{"psnr_db", "psnr_ds_db", "mean_ours", "mean_golden"}`` —
    full-resolution PSNR plus the `downsample`-box-filtered PSNR that
    suppresses independent per-pixel MC noise.
    """
    ours = np.clip(np.asarray(render01) * 255.99, 0, 255)
    gold = np.asarray(golden_u8, np.float64)
    out = {
        "psnr_db": round(psnr(ours, gold), 2),
        "mean_ours": round(float(ours.mean()), 2),
        "mean_golden": round(float(gold.mean()), 2),
    }
    if downsample > 1:
        out["psnr_ds_db"] = round(
            psnr(box_downsample(ours, downsample),
                 box_downsample(gold, downsample)), 2)
        out["downsample"] = downsample
    return out
