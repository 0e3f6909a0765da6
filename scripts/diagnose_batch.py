#!/usr/bin/env python3
"""Diagnose the 64-drop batch child's partial decode failure (r5 bench:
44/64 decoded at sub-batch 8).

Hypothesis: the relay's batched-FFT numerics bug — the same one that
bounds segmented.GROUP at 4 (>= 14 x 2^20-point FFTs per dispatch return
wrong tone powers on later rows).  The monolithic 60 s drop program runs
a 2^22-point FFT per row, so a sub-batch of 8 is 8 x 2^22 = 32 x 2^20
FFT elements — well past the observed threshold.

Prints per-row decode health for sub-batch sizes 8 / 4 / 2 so the
failure's position-dependence (relay bug) vs content-dependence (signal
bug) is unambiguous.  Usage:

    diagnose_batch.py [b ...]     sub-batch sizes to try (default: 8 4 2)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np
import jax

from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.parallel import batch as pbatch

BATCH_DROPS = 64
BATCH_SECONDS = 60.0


def build_rows():
    rng = np.random.default_rng(7)
    spec = simulator.SimSpec(duration=BATCH_SECONDS, profile_start=40.0,
                             seed=21)
    pcm, truth = simulator.synthesize(spec)
    scale = 28000 / np.max(np.abs(pcm))
    base = np.round(pcm * scale).astype(np.int16)
    rows = np.stack([
        np.clip(base + rng.integers(-300, 300, len(base)), -32768, 32767)
        .astype(np.int16)
        for _ in range(BATCH_DROPS)
    ])
    return rows, truth


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 4, 2]
    print("backend:", jax.default_backend())
    rows, truth = build_rows()
    lengths = [rows.shape[1]] * BATCH_DROPS
    for b in sizes:
        t0 = time.perf_counter()
        bad = []
        for i in range(0, BATCH_DROPS, b):
            res = pbatch.decode_batch(rows[i:i + b], 44100,
                                      lengths=lengths[i:i + b])
            for j, r in enumerate(res):
                ok = (r.status == 2
                      and r.metadata["serial_no"] == truth["serial_no"])
                if not ok:
                    bad.append((i + j, j, r.status,
                                r.metadata.get("serial_no"),
                                len(r.hexframes)))
        wall = time.perf_counter() - t0
        print(f"sub-batch {b}: {BATCH_DROPS - len(bad)}/{BATCH_DROPS} ok "
              f"({wall:.1f} s incl. compile)")
        for row, pos, st, ser, nf in bad:
            print(f"  BAD row {row:2d} (pos {pos} in sub-batch): "
                  f"status={st} serial={ser!r} frames={nf}")
        if not bad and b != sizes[0]:
            break  # found a good size; smaller ones cost compiles
    sys.stdout.flush()


if __name__ == "__main__":
    main()
