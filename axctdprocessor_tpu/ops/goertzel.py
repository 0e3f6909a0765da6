"""Windowed multi-tone DFT power probes (the pipeline's FLOP core).

The reference computes, per 0.1 s window at 25 windows/s, the magnitude
of the single-bin DFT at 400 Hz / 7500 Hz / a dead frequency
(AXCTDprocessor.py:355-364), and per demodulated bit the magnitudes at
the mark/space frequencies (demodulate.py:99-102) — all as Python loops
over ``np.sum``.

Here both become MXU matmuls:

* :func:`framed_tone_power` — strided frames of the waveform against a
  (window x 2F) cos/sin matrix: one ``(n_win, window) @ (window, 2F)``
  product per waveform.  Frames are materialized by gather; XLA fuses
  the gather into the GEMM prologue on TPU.
* :func:`tone_power_at` — per-bit powers at arbitrary start indices
  (the bit edges), same structure with a short window.

Power is reported as ``sqrt((x.c)^2 + (x.s)^2)`` — identical to the
reference's ``abs(sum(x cos + i x sin))``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def tone_matrix(window: int, freqs, fs: float, dtype=np.float64) -> np.ndarray:
    """(window, 2F) matrix of interleaved cos/sin columns per frequency."""
    k = 2 * np.pi * np.arange(window) / fs
    cols = []
    for f in freqs:
        cols.append(np.cos(k * f))
        cols.append(np.sin(k * f))
    return np.stack(cols, axis=1).astype(dtype)


def framed_tone_power(x: jnp.ndarray, window: int, stride: int, trig) -> jnp.ndarray:
    """Tone power of every length-`window` frame at the given stride.

    Returns (n_win, F).  n_win follows the reference's window count for a
    buffer of this length: frames starting at 0, stride apart, with start
    < len(x) - window (strict, AXCTDprocessor.py:357).
    """
    trig = jnp.asarray(trig, dtype=x.dtype)
    n = x.shape[0]
    n_win = max(int(np.ceil((n - window) / stride)), 0)
    starts = jnp.arange(n_win) * stride
    frames = x[starts[:, None] + jnp.arange(window)[None, :]]
    proj = frames @ trig  # (n_win, 2F) — MXU
    re, im = proj[:, 0::2], proj[:, 1::2]
    return jnp.sqrt(re * re + im * im)


def framed_tone_power_tiled(x: jnp.ndarray, window: int, stride: int, trig) -> jnp.ndarray:
    """Strided-window tone power without materializing the frame matrix.

    Decomposition: cut the waveform into stride-length tiles T (the
    stride divides every window start), split the trig matrix into
    ceil(window/stride) stride-aligned segments (zero-padded at the end),
    and compute one GEMM per segment: ``P_j = T @ trig_j``.  A window
    starting at tile w is then ``sum_j P_j[w + j]`` — three small matmuls
    and shifted adds instead of an (n_win, window) gather (which costs
    ~window/stride x the waveform in HBM and dominated stage-1 memory).

    Matches :func:`framed_tone_power` up to fp reordering; the final
    1-2 windows see zero padding instead of clamped samples (both are
    out-of-signal garbage, masked by callers).
    """
    trig = jnp.asarray(trig, dtype=x.dtype)
    n = x.shape[0]
    n_win = max(int(np.ceil((n - window) / stride)), 0)
    n_seg = int(np.ceil(window / stride))
    n_tiles = int(np.ceil(n / stride))
    x_pad = jnp.pad(x, (0, n_tiles * stride - n))
    tiles = x_pad.reshape(n_tiles, stride)

    proj = None
    for j in range(n_seg):
        seg = trig[j * stride : min((j + 1) * stride, window)]
        seg = jnp.pad(seg, ((0, stride - seg.shape[0]), (0, 0)))
        p_j = tiles @ seg  # (n_tiles, 2F) — MXU
        shifted = p_j[j : j + n_win] if j + n_win <= n_tiles else jnp.pad(
            p_j[j:], ((0, j + n_win - n_tiles), (0, 0)))
        proj = shifted if proj is None else proj + shifted
    re, im = proj[:, 0::2], proj[:, 1::2]
    return jnp.sqrt(re * re + im * im)


def tone_power_at(x: jnp.ndarray, starts: jnp.ndarray, window: int, trig) -> jnp.ndarray:
    """Tone power of frames beginning at arbitrary indices (e.g. bit edges).

    `starts` may contain clamped/invalid entries; caller masks.  Returns
    (len(starts), F).

    Lowered as a short correlation over the whole waveform followed by a
    narrow row gather: a (len(starts), window) frame gather costs ~2x the
    wall time of computing the projection at EVERY sample with conv and
    gathering only the (len(starts), 2F) results (TPU gathers pay per
    element; the conv rides the MXU).
    """
    trig = jnp.asarray(trig, dtype=x.dtype)
    starts = jnp.clip(starts, 0, x.shape[0] - window)
    # correlation: out[f, t] = sum_k x[t + k] * trig[k, f]
    proj_all = lax.conv_general_dilated(
        x[None, None, :], trig.T[:, None, :], (1,), "VALID")[0]  # (2F, n-w+1)
    proj = proj_all.T[starts]
    re, im = proj[:, 0::2], proj[:, 1::2]
    return jnp.sqrt(re * re + im * im)
