"""Pallas kernel correctness (interpret mode on CPU; real TPU in bench)."""

import numpy as np
import jax.numpy as jnp

from axctdprocessor_tpu.ops import goertzel, iir
from axctdprocessor_tpu.ops.pallas import tonepower


def _unfused(x, window, stride, freqs, fs):
    trig = goertzel.tone_matrix(window, freqs, fs, dtype=np.float32)
    p = goertzel.framed_tone_power_tiled(jnp.asarray(x, jnp.float32),
                                         window, stride, trig)
    sm = jnp.stack([iir.boxsmooth_lag(p[:, i], 5) for i in range(3)], axis=1)
    r400 = jnp.log10(sm[:, 0] / sm[:, 2])
    r7500 = jnp.log10(sm[:, 1] / sm[:, 2])
    return np.asarray(r400), np.asarray(r7500)


def test_fused_tone_ratios_interpret(rng):
    fs = 44100.0
    window, stride = int(fs / 10), int(round(fs / 25))
    freqs = [400.0, 7500.0, 3000.0]
    # tone mix so ratios are meaningful, plus noise
    t = np.arange(int(fs * 3.0)) / fs
    x = (0.4 * np.sin(2 * np.pi * 400 * t)
         + 0.2 * np.sin(2 * np.pi * 7500 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    segs = tonepower.trig_segments(window, stride, freqs, fs)
    r400, r7500 = tonepower.fused_tone_ratios(
        jnp.asarray(x), jnp.asarray(segs), window, stride, block=16,
        interpret=True)
    e400, e7500 = _unfused(x, window, stride, freqs, fs)
    assert r400.shape == e400.shape
    np.testing.assert_allclose(np.asarray(r400), e400, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r7500), e7500, rtol=2e-4, atol=2e-4)


def test_fused_tone_ratios_block_boundary_independence():
    """Different block sizes must give the same series (carry correctness)."""
    fs = 44100.0
    window, stride = int(fs / 10), int(round(fs / 25))
    t = np.arange(int(fs * 2.2)) / fs
    x = (np.sin(2 * np.pi * 400 * t)
         + 0.1 * np.random.default_rng(11).standard_normal(len(t))
         ).astype(np.float32)
    segs = tonepower.trig_segments(window, stride, [400.0, 7500.0, 3000.0], fs)
    a = tonepower.fused_tone_ratios(jnp.asarray(x), jnp.asarray(segs),
                                    window, stride, block=8, interpret=True)
    b = tonepower.fused_tone_ratios(jnp.asarray(x), jnp.asarray(segs),
                                    window, stride, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-5, atol=1e-5)
