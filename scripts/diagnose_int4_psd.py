#!/usr/bin/env python3
"""Spectral check of the int4 encoders on a failing batch row: compare
in-band noise (error vs the int16 source) of the noise-shaped C encoder
vs plain rounding, in the bands the decode reads (FSK bits ~400/800 Hz,
profile tone 7500 Hz, dead-freq reference 3000 Hz).  Pure numpy/scipy.
"""

import numpy as np
from scipy import signal as sg

from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.ops import wire as wire_ops
from axctdprocessor_tpu.utils import native

FS = 44100.0


def unpack(packed, n, peak):
    nib = np.empty(2 * len(packed), np.int16)
    nib[0::2] = (packed >> 4).astype(np.int16) - 8
    nib[1::2] = (packed & 15).astype(np.int16) - 8
    return nib[:n].astype(np.float64) * (peak / 7.0)


def band_power(f, p, lo, hi):
    m = (f >= lo) & (f < hi)
    return float(np.trapezoid(p[m], f[m]))


def main():
    rng = np.random.default_rng(7)
    spec = simulator.SimSpec(duration=60.0, profile_start=40.0, seed=21)
    pcm, _ = simulator.synthesize(spec)
    base = np.round(pcm * 28000 / np.max(np.abs(pcm))).astype(np.int16)
    rows = [np.clip(base + rng.integers(-300, 300, len(base)),
                    -32768, 32767).astype(np.int16) for _ in range(3)]
    for name, row in (("row2-BAD", rows[2]), ("row0-ok", rows[0])):
        x = row.astype(np.float64)
        peak = float(np.max(np.abs(x)))
        ns = native.quantize_int4_ns_native(row)
        assert ns is not None, "C encoder unavailable"
        y_ns = unpack(ns, len(row), peak)

        q = np.rint(row * (7.0 / peak))
        y_pl = np.clip(q, -7, 7) * (peak / 7.0)

        for tag, y in (("ns", y_ns), ("plain", y_pl)):
            err = y - x
            f, p = sg.welch(err, fs=FS, nperseg=1 << 14)
            print(f"{name} {tag:5s} err_rms={err.std():8.1f} "
                  f"P[300-900]={band_power(f, p, 300, 900):12.1f} "
                  f"P[2.7-3.3k]={band_power(f, p, 2700, 3300):12.1f} "
                  f"P[7.2-7.8k]={band_power(f, p, 7200, 7800):12.1f} "
                  f"P[>15k]={band_power(f, p, 15000, 22050):12.1f}")


if __name__ == "__main__":
    main()
