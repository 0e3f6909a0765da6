"""Fused multi-tone windowed-DFT -> smoothing -> log-ratio Pallas kernel.

This is the "fused multi-tone windowed DFT" kernel from the build plan
(SURVEY.md 2.1): the reference computes, per 0.1 s window, single-bin DFT
magnitudes at 400/7500/dead Hz in a Python loop (AXCTDprocessor.py:355-364),
then smooths them and takes log10 ratios.  The XLA path (ops.goertzel +
ops.iir.boxsmooth_lag) runs it as several fused-ish ops; this kernel does
the whole chain in ONE pipelined pass over HBM:

* the waveform is viewed as stride-length tiles; each grid step streams a
  (block, stride) tile panel into VMEM (Pallas double-buffers the copies
  across the sequential grid);
* window/stride overlap uses the tiled-GEMM decomposition — three
  stride-aligned trig segments and shifted adds — so the MXU sees dense
  (block, stride) x (stride, 8) matmuls, no gathers.  The two tile rows a
  window needs from the previous panel are carried in VMEM scratch (the
  TPU grid is sequential, so scratch is a legal cross-step carry), which
  shifts each step's windows back by n_seg-1 positions;
* the causal 6-window box smoother and the log10 ratios are fused behind
  the matmuls, with the 5-window power history in another scratch carry.

Outputs match the unfused path to fp-reordering tolerance.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8          # cos/sin columns for 400, 7500, dead (+2 pad lanes)
SMOOTH = 5         # trailing windows in the box smoother (window+1 = 6 taps)


def trig_segments(window: int, stride: int, freqs, fs: float) -> np.ndarray:
    """(n_seg, stride, LANES) stride-aligned cos/sin segment matrices.

    Column layout keeps cos and sin in contiguous lane blocks —
    [cos f0, cos f1, cos f2, pad, sin f0, sin f1, sin f2, pad] — so the
    kernel splits them with contiguous slices (Mosaic cannot lower
    strided lane gathers).
    """
    assert len(freqs) == 3
    n_seg = int(np.ceil(window / stride))
    k = 2 * np.pi * np.arange(window) / fs
    full = np.zeros((window, LANES), dtype=np.float32)
    for j, f in enumerate(freqs):
        full[:, j] = np.cos(k * f)
        full[:, 4 + j] = np.sin(k * f)
    segs = np.zeros((n_seg, stride, LANES), dtype=np.float32)
    for j in range(n_seg):
        seg = full[j * stride : min((j + 1) * stride, window)]
        segs[j, : seg.shape[0]] = seg
    return segs


def _make_kernel(block: int, n_seg: int):
    shift = n_seg - 1  # windows computed this step start at step*block - shift

    def kernel(tiles_ref, segs_ref, out_ref, tile_carry, pow_carry):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            tile_carry[:] = jnp.zeros_like(tile_carry)
            pow_carry[:] = jnp.zeros_like(pow_carry)

        # tile panel for this step's windows: previous panel's tail + new
        hist_tiles = jnp.concatenate([tile_carry[:], tiles_ref[:]], axis=0)
        proj = jnp.zeros((block, LANES), dtype=jnp.float32)
        for j in range(n_seg):
            proj = proj + jnp.dot(hist_tiles[j : j + block], segs_ref[j],
                                  preferred_element_type=jnp.float32)
        re = proj[:, 0:4]
        im = proj[:, 4:8]
        power = jnp.sqrt(re * re + im * im)  # (block, 4); lane 3 is pad

        # global window index of each row (first `shift` rows of step 0
        # are pre-signal garbage -> zeroed so smoothing stays exact)
        widx = (step * block - shift
                + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0))
        power = jnp.where(widx >= 0, power, 0.0)

        # causal box smoothing with cross-step history
        hist = jnp.concatenate([pow_carry[:], power], axis=0)
        acc = jnp.zeros_like(power)
        for t in range(SMOOTH + 1):
            acc = acc + hist[t : t + block]
        count = jnp.clip(widx + 1, 1, SMOOTH + 1).astype(jnp.float32)
        smoothed = acc / count

        tile_carry[:] = tiles_ref[block - shift :]
        pow_carry[:] = power[block - SMOOTH :]

        ln10 = np.float32(np.log(10.0))
        r400 = jnp.log(smoothed[:, 0:1] / smoothed[:, 2:3]) / ln10
        r7500 = jnp.log(smoothed[:, 1:2] / smoothed[:, 2:3]) / ln10
        out_ref[:] = jnp.concatenate(
            [r400, r7500, smoothed[:, 2:3], jnp.zeros_like(r400)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "stride", "block",
                                             "interpret"))
def fused_tone_ratios(x: jnp.ndarray, segs: jnp.ndarray, window: int,
                      stride: int, block: int = 256,
                      interpret: bool = False):
    """Smoothed r400/r7500 series for every strided window of `x`.

    Returns (r400, r7500) of length n_win = ceil((len(x)-window)/stride),
    matching framed_tone_power_tiled + boxsmooth_lag + log10 ratios.
    """
    n = x.shape[0]
    n_seg = int(segs.shape[0])
    shift = n_seg - 1
    n_win = max(int(np.ceil((n - window) / stride)), 0)
    n_steps = max(int(np.ceil((n_win + shift) / block)), 1)
    n_tiles = n_steps * block
    x_pad = jnp.pad(x.astype(jnp.float32), (0, max(n_tiles * stride - n, 0)))
    tiles = x_pad[: n_tiles * stride].reshape(n_tiles, stride)

    out = pl.pallas_call(
        _make_kernel(block, n_seg),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((block, stride), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg, stride, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps * block, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((shift, stride), jnp.float32),
            pltpu.VMEM((SMOOTH, 4), jnp.float32),
        ],
        interpret=interpret,
    )(tiles, segs)
    return out[shift : shift + n_win, 0], out[shift : shift + n_win, 1]
