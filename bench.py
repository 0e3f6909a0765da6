#!/usr/bin/env python3
"""Benchmark: full AXCTD decode throughput on one TPU chip.

Primary metric: realtime factor — seconds of 44.1 kHz AXCTD audio fully
decoded (WAV-conditioned PCM -> QC'd T/C/S/z profile + header metadata)
per second of wall clock, for the segmented TPU engine on a 600 s drop
over the default wire ("auto" = noise-shaped int4 on real TPU).  Extra
fields report the lossless-class int8 wire, the batched 64-drop
pipelined decode, and the 64-WAV archive-runner corpus throughput.

Each metric runs in its OWN subprocess: repeated heavy decodes inside
one process slow down 2-3x on the relay (measured — see
.claude/skills/verify/SKILL.md "process-lifetime drift"), so in-process
sequential metrics would understate whatever ran last.  The persistent
compile cache in .jax_cache makes the children's compiles no-ops after
their first-ever run.

Before timing, an on-TPU smoke check compares the fused Pallas tone
kernel against the MXU GEMM path on 1 s of audio — Mosaic-lowering
regressions fail the bench loudly instead of silently skewing it.

``vs_baseline`` compares against the upstream implementation measured on
this container's CPU (BASELINE_MEASURED.json: 22.66x realtime; the
reference publishes no benchmarks of its own — SURVEY.md 6).

Prints exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

# persistent compilation cache: the axon remote-compile path takes
# minutes per program; cache them across runs and subprocesses
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

REFERENCE_RTF = 22.66  # see BASELINE_MEASURED.json
DURATION = 600.0
REPEATS = 3
BATCH_DROPS = 64       # BASELINE.md:26 — the spec batch config (64/chip)
BATCH_SUB = 8          # drops per pipelined sub-batch dispatch
BATCH_SECONDS = 60.0
CORPUS_DROPS = 64      # archive-runner measurement (BASELINE.md:27 scale unit)
WAV = os.path.join(tempfile.gettempdir(), "bench_drop600.wav")
PARITY_CACHE = os.path.join(tempfile.gettempdir(), "bench_drop600_parity.txt")
CORPUS_DIR = os.path.join(tempfile.gettempdir(), "bench_corpus64")


def _write_drop():
    from axctdprocessor_tpu.models import simulator

    spec = simulator.SimSpec(duration=DURATION, profile_start=33.0, seed=11)
    pcm, truth = simulator.synthesize(spec)
    simulator.write_wav(WAV, pcm, spec.fs)
    return truth


def _parity_frames() -> list[str]:
    """Hexframes of the byte-exact parity engine on the bench drop —
    the correctness reference the timed children compare against (a
    subtly-wrong decode must fail the gate, not post a headline).
    Cached: the WAV is deterministic (seed 11)."""
    if os.path.exists(PARITY_CACHE):
        frames = open(PARITY_CACHE).read().split()
        if len(frames) > 1000:
            return frames
    from axctdprocessor_tpu.models.parity_engine import decode_wav

    res = decode_wav(WAV)
    assert res.status == 2 and len(res.hexframes) > 1000, "parity ref failed"
    with open(PARITY_CACHE, "w") as f:
        f.write(" ".join(res.hexframes))
    return res.hexframes


def _truth_serial():
    return "00123456"  # simulator default serial (checked in children)


def _batch_rows():
    """The 64 x 60 s int16 batch: one simulated drop + independent noise
    per row (no cross-drop caching can help)."""
    import numpy as np

    from axctdprocessor_tpu.models import simulator

    rng = np.random.default_rng(7)
    spec = simulator.SimSpec(duration=BATCH_SECONDS, profile_start=40.0,
                             seed=21)
    pcm, truth = simulator.synthesize(spec)
    scale = 28000 / np.max(np.abs(pcm))
    base = np.round(pcm * scale).astype(np.int16)
    batch = np.stack([
        np.clip(base + rng.integers(-300, 300, len(base)), -32768, 32767)
        .astype(np.int16)
        for _ in range(BATCH_DROPS)
    ])
    return batch, truth


def pallas_smoke(fs=44100.0):
    """Fused Pallas tone kernel vs the unfused MXU path, on hardware."""
    import jax
    import jax.numpy as jnp

    from axctdprocessor_tpu.ops import goertzel, iir
    from axctdprocessor_tpu.ops.pallas import tonepower

    if jax.default_backend() != "tpu":
        return False
    rng = np.random.default_rng(3)
    t = np.arange(int(fs)) / fs
    x = (0.4 * np.sin(2 * np.pi * 400 * t)
         + 0.2 * np.sin(2 * np.pi * 7500 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    window, stride = int(fs / 10), int(round(fs / 25))
    freqs = [400.0, 7500.0, 3000.0]

    segs = tonepower.trig_segments(window, stride, freqs, fs)
    r400, r7500 = jax.jit(
        lambda v, s: tonepower.fused_tone_ratios(v, s, window, stride)
    )(jnp.asarray(x), jnp.asarray(segs))

    trig = goertzel.tone_matrix(window, freqs, fs, dtype=np.float32)

    def unfused(v, tm):
        p = goertzel.framed_tone_power_tiled(v, window, stride, tm)
        sm = jnp.stack([iir.boxsmooth_lag(p[:, i], 5) for i in range(3)],
                       axis=1)
        return jnp.log10(sm[:, 0] / sm[:, 2]), jnp.log10(sm[:, 1] / sm[:, 2])

    e400, e7500 = jax.jit(unfused)(jnp.asarray(x), jnp.asarray(trig))
    np.testing.assert_allclose(np.asarray(r400), np.asarray(e400),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r7500), np.asarray(e7500),
                               rtol=2e-4, atol=2e-4)
    return True


def child_single(wire: str) -> None:
    """Timed single-file decode in a fresh process; prints WALL seconds."""
    from axctdprocessor_tpu.models.tpu_engine import decode_wav_tpu

    res = decode_wav_tpu(WAV, wire=wire)  # warmup: compile + first D2H
    assert res.status == 2 and len(res.time) > 1000, (
        f"warmup decode failed: status={res.status} rows={len(res.time)}")
    assert res.metadata["serial_no"] == _truth_serial()
    assert res.overflow == 0, f"clipped decode: overflow={res.overflow}"
    n_frames = len(res.hexframes)
    # correctness gate vs the byte-exact parity engine (not just "many
    # frames": a symmetric frame-loss regression must fail here)
    parity = set(open(PARITY_CACHE).read().split())
    got = set(res.hexframes)
    agree = len(got & parity) / max(len(got | parity), 1)
    # every wire measures 1.0 on the bench drop (r4); the noise-shaped
    # int4 wire tests >= 0.998 on noisy drops — hold the headline to
    # int8-class correctness, not the old 0.97 concession
    floor = 0.99
    assert agree > floor, f"frame agreement vs parity {agree:.4f} < {floor}"

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = decode_wav_tpu(WAV, wire=wire)
        times.append(time.perf_counter() - t0)
    assert abs(len(res.hexframes) - n_frames) <= 0.01 * n_frames
    print(f"WALL {min(times):.6f} FRAMES {n_frames} WIRE {res.wire} "
          f"AGREE {agree:.4f}")


def child_resident() -> None:
    """Device-resident decode throughput: every segment ext buffer
    pre-staged in HBM, then time (segment dispatches + assemble +
    packed-result fetch) for the 600 s drop.  This is the compute
    capability a locally attached chip gets — the end-to-end children
    pay the relay wire (upload + fetch latency) on top of it; prints
    WALL seconds."""
    import jax
    import jax.numpy as jnp

    from axctdprocessor_tpu.models import segmented, tpu_engine as eng
    from axctdprocessor_tpu.ops import wire as wire_ops
    from axctdprocessor_tpu.utils.config import DecoderConfig
    from axctdprocessor_tpu.utils.wavio import read_wav_raw16

    cfg = DecoderConfig()
    raw, fs = read_wav_raw16(WAV)
    fs = float(fs)
    q = wire_ops.quantize_int8(raw)  # int8: plain-sliced ext buffers
    n = len(q)

    d_pcm, n_power, seg_len, right, c_seg = segmented._seg_geometry(fs)
    npcm = (int(np.round(fs / cfg.bitrate * (1 - cfg.phase_error / 100)))
            - 2 * cfg.bit_inset)
    ext_len = segmented.LEFT_HALO + seg_len + right
    n_seg = max(int(np.ceil(n / seg_len)), 1)
    n_seg_pad = segmented._bucket_count(n_seg)
    dims = eng.EngineDims.for_waveform(n_seg_pad * seg_len, fs, cfg.bitrate,
                                       npcm)
    power_trig, bit_trig, sos = eng.engine_tables(cfg, fs, dims)
    seg_fn = segmented._segment_program(fs, npcm, cfg.bit_inset, 100, True)
    pt, so, bt = (jnp.asarray(a, jnp.float32)
                  for a in (power_trig, sos, bit_trig))
    ds = jnp.asarray(np.zeros((1, 6)), jnp.float32)
    dc = jnp.asarray(np.float32(np.mean(q)))
    peak = jnp.asarray(np.float32(max(int(q.max()), -int(q.min()), 1)))
    nv = jnp.asarray(n, jnp.int32)

    def build_ext(k):
        lo = k * seg_len - segmented.LEFT_HALO
        hi = k * seg_len + seg_len + right
        ext = np.zeros(ext_len, q.dtype)
        s_lo, s_hi = max(lo, 0), min(hi, n)
        ext[s_lo - lo : s_hi - lo] = q[s_lo:s_hi]
        return ext

    # grouped dispatch (A/B'd on chip, bench_artifacts/resident_group.json):
    # vmapped chunks of 4 segments per dispatch + the chunked assemble cut
    # resident wall 173.7 -> 148.2 ms vs one-dispatch-per-segment; larger
    # groups (14+) were slower AND numerically wrong on the relay's
    # batched-FFT path, so the group size stays fixed at 4.
    GROUP = 4
    n_chunk = (n_seg_pad + GROUP - 1) // GROUP
    exts_np = np.stack([build_ext(k) if k < n_seg else
                        np.zeros(ext_len, q.dtype)
                        for k in range(n_chunk * GROUP)])
    koffs_np = np.asarray([min(k, n_seg) * seg_len
                           for k in range(n_chunk * GROUP)], np.int32)
    chunks = [jax.device_put(jnp.asarray(exts_np[j*GROUP:(j+1)*GROUP]))
              for j in range(n_chunk)]
    kchunks = [jax.device_put(jnp.asarray(koffs_np[j*GROUP:(j+1)*GROUP]))
               for j in range(n_chunk)]
    vseg = jax.jit(jax.vmap(
        seg_fn, in_axes=(0, None, None, 0, None, None, None, None, None)))
    assemble = segmented._assemble_program_chunked(dims, fs,
                                                   float(cfg.bitrate))
    params = eng.fused_inputs(cfg, fs)

    def run_async():
        outs = [vseg(chunks[j], dc, peak, kchunks[j], nv, pt, so, bt, ds)
                for j in range(n_chunk)]
        return assemble(*[tuple(o[i] for o in outs) for i in range(5)],
                        nv, params["trig_i"], params["trig_f"],
                        params["hdr_rel"], params["calib_off"],
                        params["coeff_defaults"], params["temp_lut"],
                        params["limits"])

    def run():
        return jax.device_get(run_async())

    host = run()  # warmup (compile + first D2H)
    res = eng.finish_result(host, 44100, n, fs, cfg)
    assert res.status == 2 and res.metadata["serial_no"] == _truth_serial()
    parity = set(open(PARITY_CACHE).read().split())
    got = set(res.hexframes)
    agree = len(got & parity) / max(len(got | parity), 1)
    assert agree > 0.97, f"resident decode agreement {agree:.4f}"

    times = []
    for _ in range(max(REPEATS, 4)):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)

    # sustained resident throughput: K back-to-back decodes with every
    # result fetched after the last dispatch, so decode i's result fetch
    # rides under decode i+1's device compute — the steady state of a
    # corpus/archive job with resident data
    K = 4
    tput = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs_k = [run_async() for _ in range(K)]
        for o in outs_k:
            jax.device_get(o)
        tput = min(tput, (time.perf_counter() - t0) / K)

    print(f"WALL {min(times):.6f} FRAMES {len(res.hexframes)} "
          f"AGREE {agree:.4f} TPUT {tput:.6f}")


def child_batch() -> None:
    """Timed 64 x 60 s pipelined batch decode; prints WALL seconds."""
    from axctdprocessor_tpu.parallel.pipeline import decode_batches_pipelined

    batch, truth = _batch_rows()
    lengths = [batch.shape[1]] * BATCH_SUB
    batches = [(batch[i:i + BATCH_SUB], lengths)
               for i in range(0, BATCH_DROPS, BATCH_SUB)]

    piped = decode_batches_pipelined(batches, 44100)  # warmup + compile
    flat = [r for b in piped for r in b]
    ok = sum(r.status == 2 and r.metadata["serial_no"] == truth["serial_no"]
             for r in flat)
    assert ok == BATCH_DROPS, f"batch warmup: {ok}/{BATCH_DROPS} decoded"

    times = []
    for _ in range(max(REPEATS - 1, 2)):
        t0 = time.perf_counter()
        decode_batches_pipelined(batches, 44100)
        times.append(time.perf_counter() - t0)
    print(f"WALL {min(times):.6f} FRAMES {sum(len(r.hexframes) for r in flat)}")


def child_corpus() -> None:
    """Timed archive run: CORPUS_DROPS x 60 s WAVs from disk through the
    corpus runner (reads + batched decode + reports + manifest); prints
    WALL seconds.  This is the BASELINE archive config measured end to
    end at a 64-drop scale unit."""
    import glob
    import shutil

    from axctdprocessor_tpu.parallel.archive import reprocess_corpus

    if len(glob.glob(os.path.join(CORPUS_DIR, "*.wav"))) != CORPUS_DROPS:
        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        os.makedirs(CORPUS_DIR, exist_ok=True)
        from scipy.io import wavfile

        batch, _ = _batch_rows()
        for i in range(CORPUS_DROPS):
            wavfile.write(os.path.join(CORPUS_DIR, f"drop{i:03d}.wav"),
                          44100, batch[i])
    paths = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.wav")))

    out = os.path.join(tempfile.gettempdir(), "bench_corpus_out")
    shutil.rmtree(out, ignore_errors=True)
    manifest = reprocess_corpus(paths, out, batch_size=BATCH_SUB,
                                resume=False)  # warmup + compile
    done = sum(1 for v in manifest["files"].values() if v["status"] == "done")
    assert done == CORPUS_DROPS, f"corpus warmup: {done}/{CORPUS_DROPS}"

    times = []
    for _ in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        reprocess_corpus(paths, out, batch_size=BATCH_SUB, resume=False)
        times.append(time.perf_counter() - t0)
    print(f"WALL {min(times):.6f} FRAMES {done}")


def _run_child(mode: str, timeout: float = 2400.0):
    """Run one metric in a fresh interpreter; returns (wall_s, agree).

    ``agree`` is the child's frame agreement vs the parity engine, or
    None for modes that don't print one.  A hung child (relay outage)
    raises RuntimeError like any other failure — never TimeoutExpired
    (round 3's bench died on exactly that unhandled exception).
    """
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        raise RuntimeError(f"child {mode} hung (> {timeout:.0f} s)") from e
    for line in (proc.stdout or "").splitlines():
        if line.startswith("WALL "):
            toks = line.split()
            wall = float(toks[1])
            agree = (float(toks[toks.index("AGREE") + 1])
                     if "AGREE" in toks else None)
            tput = (float(toks[toks.index("TPUT") + 1])
                    if "TPUT" in toks else None)
            return wall, agree, tput
    raise RuntimeError(
        f"child {mode} rc={proc.returncode}: {proc.stderr[-2000:]}")


def _probe_backend(max_attempts: int = 30) -> bool:
    """Wait out a relay outage.  Probed in a SUBPROCESS (jax caches a
    failed backend init for the life of a process) with BOTH observed
    outage modes handled: error exit AND indefinite hang (round 3's
    bench crashed on the hang mode — TimeoutExpired was unhandled)."""
    for attempt in range(max_attempts):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=180)
            if probe.returncode == 0:
                return True
            msg = (probe.stderr.strip().splitlines()[-1]
                   if probe.stderr else "?")
        except subprocess.TimeoutExpired:
            msg = "probe hung > 180 s"
        print(f"# backend unavailable (attempt {attempt + 1}): {msg}",
              file=sys.stderr)
        time.sleep(60)
    return False


def _try_child(mode: str, attempts: int = 2, timeout: float = 2400.0):
    """(wall, agree) or (None, None); waits out mid-run outages between
    attempts so one relay blip can't null a metric."""
    for i in range(attempts):
        try:
            return _run_child(mode, timeout=timeout)
        except Exception as e:
            print(f"# child {mode} attempt {i + 1}/{attempts} failed: {e}",
                  file=sys.stderr)
            if i + 1 < attempts:
                _probe_backend(max_attempts=10)
    return None, None, None


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        mode = sys.argv[2]
        if mode == "single_auto":
            child_single("auto")  # noise-shaped int4 on real TPU
        elif mode == "single_int8":
            child_single("int8")
        elif mode == "resident":
            child_resident()
        elif mode == "batch":
            child_batch()
        elif mode == "corpus":
            child_corpus()
        elif mode == "smoke":
            print(f"WALL {0.0 if pallas_smoke() else -1.0:.6f}")
        else:
            raise SystemExit(f"unknown child mode {mode}")
        return

    # the relay backend has outage windows (observed: init raises
    # UNAVAILABLE for tens of minutes, OR hangs); wait them out rather
    # than crashing an unattended bench run.
    backend_ok = _probe_backend()

    # everything below must not import jax in THIS process: host-side
    # prep is numpy-only, and all device work happens in retried,
    # timeout-bounded children — the bench always prints its JSON line.
    _write_drop()
    _parity_frames()  # correctness reference for the timed children

    smoke_wall, _, _ = _try_child("smoke")  # Pallas-vs-MXU hardware check
    smoke = smoke_wall == 0.0

    wall, agree_auto, _ = _try_child("single_auto", attempts=3)
    wall_int8, agree_int8, _ = _try_child("single_int8")
    int8_rtf = round(DURATION / wall_int8, 1) if wall_int8 else None

    wall_res, agree_res, tput_res = _try_child("resident")
    resident_rtf = round(DURATION / wall_res, 1) if wall_res else None

    batch_wall, _, _ = _try_child("batch", attempts=3)
    batch_rtf = (round(BATCH_DROPS * BATCH_SECONDS / batch_wall, 1)
                 if batch_wall else None)

    corpus_wall, _, _ = _try_child("corpus")
    corpus_rtf = (round(CORPUS_DROPS * BATCH_SECONDS / corpus_wall, 1)
                  if corpus_wall else None)

    # headline: the default-wire single-file decode; degrade to the
    # lossless int8 wire if the auto child never succeeded, so a partial
    # outage still records a real measured number instead of nothing.
    if wall is not None:
        rtf, headline_wire = DURATION / wall, "int4-ns"
    elif wall_int8 is not None:
        rtf, headline_wire = DURATION / wall_int8, "int8"
        wall = wall_int8
    else:
        rtf, headline_wire = 0.0, None  # relay never came back

    print(json.dumps({
        "metric": "decode_realtime_factor",
        "value": round(rtf, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / REFERENCE_RTF, 2),
        "single_wall_s": round(wall, 3) if wall else None,
        "wire_auto": headline_wire,
        "frame_agreement_auto": agree_auto,
        "frame_agreement_int8": agree_int8,
        "frame_agreement_resident": agree_res,
        "int8_rtf": int8_rtf,
        "resident_rtf": resident_rtf,
        "resident_tput_rtf": (round(DURATION / tput_res, 1)
                              if tput_res else None),
        "batch_rtf": batch_rtf,
        "batch_drops": BATCH_DROPS,
        "batch_wall_s": round(batch_wall, 3) if batch_wall else None,
        "corpus_rtf": corpus_rtf,
        "corpus_drops": CORPUS_DROPS,
        "pallas_smoke": bool(smoke),
        "backend_ok": bool(backend_ok),
    }))


if __name__ == "__main__":
    main()
