#!/usr/bin/env python3
"""Benchmark: full AXCTD decode throughput on one TPU chip.

Primary metric: realtime factor — seconds of 44.1 kHz AXCTD audio fully
decoded (WAV-conditioned PCM -> QC'd T/C/S/z profile + header metadata)
per second of wall clock, for the segmented TPU engine on a 600 s drop
over the default wire ("auto" = noise-shaped int4 on real TPU).  Extra
fields report the device-resident decode (prestaged HBM buffers — the
compute capability a locally attached chip gets end to end), the
lossless-class int8 wire, the batched 64-drop pipelined decode, and the
64-WAV archive-runner corpus throughput.

Each metric runs in its OWN subprocess: repeated heavy decodes inside
one process slow down 2-3x on the relay (measured — see
.claude/skills/verify/SKILL.md "process-lifetime drift"), so in-process
sequential metrics would understate whatever ran last.  The persistent
compile cache in .jax_cache makes the children's compiles no-ops after
their first-ever run.

The bench treats its own output as a product with an SLO (three driver
runs were lost to kills with nothing printed):

* a GLOBAL DEADLINE (AXCTD_BENCH_DEADLINE_S, default 1800 s) is checked
  before every child; children that no longer fit are SKIPPED and the
  line still prints with whatever was measured;
* metrics run HEADLINE-FIRST (single_auto, then resident, then the
  secondary children) so an early kill still records the number that
  matters;
* after every child the current partial JSON is flushed to stderr
  (``# partial {...}``), and SIGTERM/SIGINT print the final line with
  whatever exists before exiting — the driver's ``timeout`` kill
  therefore still yields a parseable record in the tail;
* every child prints its own one-line ``#CHILD {...}`` JSON to stderr
  as it finishes (even on assert failure) for post-mortem forensics;
* the relay outage probe is capped (~10 min) instead of unbounded.

Before timing, an on-TPU smoke check compares the fused Pallas tone
kernel against the MXU GEMM path on 1 s of audio — Mosaic-lowering
regressions fail the bench loudly instead of silently skewing it.

``vs_baseline`` compares against the upstream implementation measured on
this container's CPU (BASELINE_MEASURED.json: 22.66x realtime; the
reference publishes no benchmarks of its own — SURVEY.md 6).

Prints exactly one JSON line on stdout.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

# persistent compilation cache: the axon remote-compile path takes
# minutes per program; cache them across runs and subprocesses.  The
# env mutation feeds the CHILDREN (their interpreters start after it);
# this parent process itself needs config.update because sitecustomize
# imported jax before this line ran (env read at import — a setdefault
# here is silently ignored by the current process).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

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

DEADLINE_S = float(os.environ.get("AXCTD_BENCH_DEADLINE_S", "1800"))
_T0 = time.monotonic()

# what the children record as they go; dumped to stderr on exit so a
# killed/asserted child still leaves its numbers behind
CHILD_REC: dict = {}

# the accumulating bench record; _emit() serializes it after every child
RESULT: dict = {}


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


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

    t0 = time.perf_counter()
    res = decode_wav_tpu(WAV, wire=wire)  # warmup: compile + first D2H
    CHILD_REC["warmup_s"] = round(time.perf_counter() - t0, 3)
    assert res.status == 2 and len(res.time) > 1000, (
        f"warmup decode failed: status={res.status} rows={len(res.time)}")
    assert res.metadata["serial_no"] == _truth_serial()
    assert res.overflow == 0, f"clipped decode: overflow={res.overflow}"
    n_frames = len(res.hexframes)
    CHILD_REC["frames"] = n_frames
    # correctness gate vs the byte-exact parity engine (not just "many
    # frames": a symmetric frame-loss regression must fail here)
    parity = set(open(PARITY_CACHE).read().split())
    got = set(res.hexframes)
    agree = len(got & parity) / max(len(got | parity), 1)
    CHILD_REC["agree"] = round(agree, 4)
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
        CHILD_REC["wall_s"] = round(min(times), 4)
    assert abs(len(res.hexframes) - n_frames) <= 0.01 * n_frames
    print(f"WALL {min(times):.6f} FRAMES {n_frames} WIRE {res.wire} "
          f"AGREE {agree:.4f}")


def child_resident() -> None:
    """Device-resident decode throughput through the PUBLIC prestaged
    API (segmented.prestage_waveform): every grouped segment buffer
    pre-staged in HBM, then time (grouped dispatches + chunked assemble
    + packed-result fetch) for the 600 s drop.  This is the compute
    capability a locally attached chip gets — the end-to-end children
    pay the relay wire (upload + fetch latency) on top of it; prints
    WALL seconds plus the pipelined sustained-throughput TPUT."""
    import jax

    from axctdprocessor_tpu.models.segmented import prestage_waveform
    from axctdprocessor_tpu.utils.wavio import read_wav_raw16

    raw, fs = read_wav_raw16(WAV)
    t0 = time.perf_counter()
    st = prestage_waveform(raw, float(fs), wire="int8")
    CHILD_REC["prestage_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    res = st.decode()  # warmup (compile + first D2H)
    CHILD_REC["warmup_s"] = round(time.perf_counter() - t0, 3)
    assert res.status == 2 and res.metadata["serial_no"] == _truth_serial()
    parity = set(open(PARITY_CACHE).read().split())
    got = set(res.hexframes)
    agree = len(got & parity) / max(len(got | parity), 1)
    CHILD_REC["frames"] = len(res.hexframes)
    CHILD_REC["agree"] = round(agree, 4)
    assert agree > 0.99, f"resident decode agreement {agree:.4f}"

    times = []
    for _ in range(max(REPEATS, 4)):
        t0 = time.perf_counter()
        jax.device_get(st.dispatch())
        times.append(time.perf_counter() - t0)
        CHILD_REC["wall_s"] = round(min(times), 4)

    # sustained resident throughput: K back-to-back decodes with every
    # result fetched after the last dispatch, so decode i's result fetch
    # rides under decode i+1's device compute — the steady state of a
    # corpus/archive job with resident data.  K=8 by on-chip depth sweep
    # (bench_artifacts/resident_ksweep.json: 121.2/117.3/115.8/116.8 ms
    # per drop at K=4/8/12/16 — K>=8 clears the 5000x north star with
    # the fetch overhead fully hidden; 12+ is noise-level better)
    K = 8
    tput = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs_k = [st.dispatch() for _ in range(K)]
        for o in outs_k:
            jax.device_get(o)
        tput = min(tput, (time.perf_counter() - t0) / K)
        CHILD_REC["tput_s"] = round(tput, 4)

    print(f"WALL {min(times):.6f} FRAMES {len(res.hexframes)} "
          f"AGREE {agree:.4f} TPUT {tput:.6f}")


def child_batch() -> None:
    """Timed 64 x 60 s pipelined batch decode; prints WALL seconds."""
    from axctdprocessor_tpu.parallel.pipeline import decode_batches_pipelined

    batch, truth = _batch_rows()
    lengths = [batch.shape[1]] * BATCH_SUB
    batches = [(batch[i:i + BATCH_SUB], lengths)
               for i in range(0, BATCH_DROPS, BATCH_SUB)]

    t0 = time.perf_counter()
    piped = decode_batches_pipelined(batches, 44100)  # warmup + compile
    CHILD_REC["warmup_s"] = round(time.perf_counter() - t0, 3)
    flat = [r for b in piped for r in b]
    ok = sum(r.status == 2 and r.metadata["serial_no"] == truth["serial_no"]
             for r in flat)
    assert ok == BATCH_DROPS, f"batch warmup: {ok}/{BATCH_DROPS} decoded"

    times = []
    for _ in range(max(REPEATS - 1, 2)):
        t0 = time.perf_counter()
        decode_batches_pipelined(batches, 44100)
        times.append(time.perf_counter() - t0)
        CHILD_REC["wall_s"] = round(min(times), 4)
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
    t0 = time.perf_counter()
    manifest = reprocess_corpus(paths, out, batch_size=BATCH_SUB,
                                resume=False)  # warmup + compile
    CHILD_REC["warmup_s"] = round(time.perf_counter() - t0, 3)
    done = sum(1 for v in manifest["files"].values() if v["status"] == "done")
    assert done == CORPUS_DROPS, f"corpus warmup: {done}/{CORPUS_DROPS}"

    times = []
    for _ in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        reprocess_corpus(paths, out, batch_size=BATCH_SUB, resume=False)
        times.append(time.perf_counter() - t0)
        CHILD_REC["wall_s"] = round(min(times), 4)
    print(f"WALL {min(times):.6f} FRAMES {done}")


def _run_child(mode: str, timeout: float = 2400.0):
    """Run one metric in a fresh interpreter; returns (wall_s, agree,
    tput_s).

    ``agree`` is the child's frame agreement vs the parity engine and
    ``tput_s`` its pipelined sustained per-decode wall; None for modes
    that don't print them.  A hung child (relay outage) raises
    RuntimeError like any other failure — never TimeoutExpired (round
    3's bench died on exactly that unhandled exception).
    """
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        raise RuntimeError(f"child {mode} hung (> {timeout:.0f} s)") from e
    for line in (proc.stderr or "").splitlines():
        if line.startswith("#CHILD "):
            print(line, file=sys.stderr, flush=True)  # forensic record
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


def _probe_backend(max_attempts: int = 30, max_wait_s: float = 600.0) -> bool:
    """Wait out a relay outage — but BOUNDED (default ~10 min): an
    unbounded wait starved round 4's children of the whole driver
    budget.  Probed in a SUBPROCESS (jax caches a failed backend init
    for the life of a process) with BOTH observed outage modes handled:
    error exit AND indefinite hang."""
    t0 = time.monotonic()
    for attempt in range(max_attempts):
        budget = min(120.0, max_wait_s - (time.monotonic() - t0))
        if budget <= 0:
            break
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=budget)
            if probe.returncode == 0:
                return True
            msg = (probe.stderr.strip().splitlines()[-1]
                   if probe.stderr else "?")
        except subprocess.TimeoutExpired:
            msg = f"probe hung > {budget:.0f} s"
        print(f"# backend unavailable (attempt {attempt + 1}): {msg}",
              file=sys.stderr, flush=True)
        if time.monotonic() - t0 + 30 > max_wait_s:
            break
        time.sleep(30)
    return False


def _try_child(mode: str, attempts: int = 2, timeout: float = 2400.0,
               est_s: float = 240.0):
    """(wall, agree, tput) or (None, None, None); waits out mid-run
    outages between attempts so one relay blip can't null a metric.
    Respects the global deadline: a child that no longer fits is skipped
    (recorded in RESULT["skipped"]) instead of blowing the budget."""
    for i in range(attempts):
        left = _remaining()
        if left < est_s:
            print(f"# skipping {mode}: {left:.0f} s left < {est_s:.0f} s "
                  f"estimate", file=sys.stderr, flush=True)
            RESULT.setdefault("skipped", []).append(mode)
            return None, None, None
        try:
            return _run_child(mode, timeout=max(min(timeout, left - 20), 60))
        except Exception as e:
            print(f"# child {mode} attempt {i + 1}/{attempts} failed: {e}",
                  file=sys.stderr, flush=True)
            if i + 1 < attempts and _remaining() > est_s + 60:
                _probe_backend(max_attempts=10,
                               max_wait_s=min(300.0, _remaining() / 3))
    return None, None, None


def _payload() -> dict:
    """The bench JSON from whatever RESULT currently holds."""
    r = RESULT
    wall = r.get("wall_auto")
    wall_int8 = r.get("wall_int8")
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
    wall_res, tput_res = r.get("wall_res"), r.get("tput_res")
    batch_wall, corpus_wall = r.get("batch_wall"), r.get("corpus_wall")
    out = {
        "metric": "decode_realtime_factor",
        "value": round(rtf, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / REFERENCE_RTF, 2),
        "single_wall_s": round(wall, 3) if wall else None,
        "wire_auto": headline_wire,
        "frame_agreement_auto": r.get("agree_auto"),
        "frame_agreement_int8": r.get("agree_int8"),
        "frame_agreement_resident": r.get("agree_res"),
        "int8_rtf": (round(DURATION / wall_int8, 1) if wall_int8 else None),
        "resident_rtf": (round(DURATION / wall_res, 1) if wall_res else None),
        "resident_tput_rtf": (round(DURATION / tput_res, 1)
                              if tput_res else None),
        "batch_rtf": (round(BATCH_DROPS * BATCH_SECONDS / batch_wall, 1)
                      if batch_wall else None),
        "batch_drops": BATCH_DROPS,
        "batch_wall_s": round(batch_wall, 3) if batch_wall else None,
        "corpus_rtf": (round(CORPUS_DROPS * BATCH_SECONDS / corpus_wall, 1)
                       if corpus_wall else None),
        "corpus_drops": CORPUS_DROPS,
        "pallas_smoke": r.get("smoke"),
        "backend_ok": r.get("backend_ok"),
    }
    if r.get("skipped"):
        out["skipped"] = r["skipped"]
    return out


_FINAL_PRINTED = False


def _emit(final: bool) -> None:
    """Flush the current record: partials go to stderr after every child
    (a killed run still leaves the numbers in the tail); the final line
    is the one stdout JSON line of record."""
    global _FINAL_PRINTED
    if final:
        if not _FINAL_PRINTED:
            _FINAL_PRINTED = True
            print(json.dumps(_payload()), flush=True)
    else:
        print("# partial " + json.dumps(_payload()), file=sys.stderr,
              flush=True)


def _terminate(signum, frame):  # pragma: no cover - exercised by driver
    RESULT.setdefault("skipped", []).append(f"signal{signum}")
    _emit(final=True)
    os._exit(0)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        mode = sys.argv[2]
        CHILD_REC["mode"] = mode
        try:
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
        finally:
            # forensic one-liner: even a child that asserts mid-run
            # leaves whatever it measured in the parent's stderr
            print("#CHILD " + json.dumps(CHILD_REC), file=sys.stderr,
                  flush=True)
        return

    signal.signal(signal.SIGTERM, _terminate)
    signal.signal(signal.SIGINT, _terminate)

    # the relay backend has outage windows (observed: init raises
    # UNAVAILABLE for tens of minutes, OR hangs); wait them out — but
    # bounded, leaving the children most of the deadline budget.
    RESULT["backend_ok"] = _probe_backend(
        max_wait_s=min(600.0, DEADLINE_S / 3))

    # everything below must not import jax in THIS process: host-side
    # prep is numpy-only, and all device work happens in retried,
    # timeout-bounded children — the bench always prints its JSON line.
    _write_drop()
    _parity_frames()  # correctness reference for the timed children

    # headline first, then the resident capability number, then the
    # secondary metrics — an early kill costs the least valuable child
    wall, agree, _ = _try_child("single_auto", attempts=2, est_s=240)
    RESULT["wall_auto"], RESULT["agree_auto"] = wall, agree
    _emit(final=False)

    wall_res, agree_res, tput_res = _try_child("resident", est_s=240)
    RESULT["wall_res"] = wall_res
    RESULT["agree_res"] = agree_res
    RESULT["tput_res"] = tput_res
    _emit(final=False)

    smoke_wall, _, _ = _try_child("smoke", attempts=1, est_s=120)
    RESULT["smoke"] = smoke_wall == 0.0  # Pallas-vs-MXU hardware check
    _emit(final=False)

    wall_int8, agree_int8, _ = _try_child("single_int8", est_s=180)
    RESULT["wall_int8"], RESULT["agree_int8"] = wall_int8, agree_int8
    _emit(final=False)

    batch_wall, _, _ = _try_child("batch", attempts=2, est_s=240)
    RESULT["batch_wall"] = batch_wall
    _emit(final=False)

    corpus_wall, _, _ = _try_child("corpus", est_s=240)
    RESULT["corpus_wall"] = corpus_wall

    _emit(final=True)


if __name__ == "__main__":
    main()
