#!/usr/bin/env python3
"""Benchmark: full AXCTD decode throughput on one TPU chip.

Metric: realtime factor — seconds of 44.1 kHz AXCTD audio fully decoded
(WAV-conditioned PCM -> QC'd T/C/S/z profile + header metadata) per
second of wall clock, for the fused TPU engine on a 600 s drop.

``vs_baseline`` compares against the upstream implementation measured on
this container's CPU (BASELINE_MEASURED.json: 22.66x realtime; the
reference publishes no benchmarks of its own — SURVEY.md 6).

Prints exactly one JSON line.
"""

import json
import os
import time

# persistent compilation cache: the axon remote-compile path takes
# ~15 min for the 600 s-waveform programs; cache them across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

REFERENCE_RTF = 22.66  # see BASELINE_MEASURED.json
DURATION = 600.0
REPEATS = 3


def main():
    import tempfile

    from axctdprocessor_tpu.models import simulator
    from axctdprocessor_tpu.models.tpu_engine import decode_wav_tpu

    spec = simulator.SimSpec(duration=DURATION, profile_start=33.0, seed=11)
    pcm, truth = simulator.synthesize(spec)
    wav = os.path.join(tempfile.gettempdir(), "bench_drop600.wav")
    simulator.write_wav(wav, pcm, spec.fs)

    # warmup: compile both stages and the (slow first) device->host path
    res = decode_wav_tpu(wav)
    assert res.status == 2 and len(res.time) > 1000, (
        f"warmup decode failed: status={res.status} rows={len(res.time)}")
    assert res.metadata["serial_no"] == truth["serial_no"]

    # timed: full WAV-file -> QC'd profile decode, end to end
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = decode_wav_tpu(wav)
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = DURATION / wall

    print(json.dumps({
        "metric": "decode_realtime_factor",
        "value": round(rtf, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / REFERENCE_RTF, 2),
    }))


if __name__ == "__main__":
    main()
