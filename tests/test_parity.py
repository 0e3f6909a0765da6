"""Golden byte-parity tests: our CLI output vs the reference CLI output.

These are the project's primary correctness gates (BASELINE.json configs):
for each configuration, the reference implementation (run in-process via
ref_harness) and our parity engine must produce byte-identical
``output.txt`` files.
"""

import numpy as np
import pytest

from axctdprocessor_tpu import cli
from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.models.parity_engine import decode_wav
from ref_harness import run_reference_cli, run_reference_processor


def _cli_flags_from(settings: dict) -> list[str]:
    flags = []
    if "minR400" in settings:
        flags += ["-p", str(settings["minR400"])]
    if "mindR7500" in settings:
        flags += ["-t", str(settings["mindR7500"])]
    if "deadfreq" in settings:
        flags += ["-d", str(settings["deadfreq"])]
    if "pointsperloop" in settings:
        flags += ["-l", str(settings["pointsperloop"])]
    if "mark_space_freqs" in settings:
        flags += ["-m", str(settings["mark_space_freqs"][0]),
                  "-n", str(settings["mark_space_freqs"][1])]
    if settings.get("use_bandpass"):
        flags += ["-u"]
    return flags


def _assert_byte_parity(wav, tmp_path, settings=None, label="cfg"):
    ref_out = tmp_path / f"ref_{label}.txt"
    my_out = tmp_path / f"my_{label}.txt"
    run_reference_cli(wav, str(ref_out), settings=dict(settings or {}))
    argv = ["-i", wav, "-o", str(my_out), "--quiet"] + _cli_flags_from(settings or {})
    assert cli.main(argv) == 0
    a, b = ref_out.read_bytes(), my_out.read_bytes()
    assert a == b, f"{label}: outputs differ ({len(a)} vs {len(b)} bytes)"
    return a


def test_default_byte_parity(default_drop_wav, tmp_path):
    wav, _ = default_drop_wav
    out = _assert_byte_parity(wav, tmp_path, label="default")
    # sanity: the parity covers a real decode, not an empty report
    assert out.count(b"\n") > 200
    assert b"Probe Serial: 00123456" in out


def test_deadfreq_flag_parity(default_drop_wav, tmp_path):
    # -d reaches the engine even in strict mode
    wav, _ = default_drop_wav
    _assert_byte_parity(wav, tmp_path, {"deadfreq": 2600.0}, label="deadfreq")


def test_inert_flags_strict_parity(default_drop_wav, tmp_path):
    # -p/-t/-l/-u are inert upstream (settings key mismatch); our strict
    # mode must reproduce that: engine output unchanged, echo changed.
    wav, _ = default_drop_wav
    settings = {"minR400": 5.0, "mindR7500": 9.0, "pointsperloop": 123456,
                "use_bandpass": True}
    out = _assert_byte_parity(wav, tmp_path, settings, label="inert")
    assert b"Min. 400 Hz power ratio: 5.0" in out  # echoed
    assert b"Probe Serial: 00123456" in out        # ...but decode unaffected


def test_decimation_path_parity(tmp_path_factory, tmp_path):
    # fs > 50 kHz triggers the x2 decimator and float fs bookkeeping
    spec = simulator.SimSpec(fs=88200, duration=45.0, profile_start=33.0, seed=3)
    pcm, truth = simulator.synthesize(spec)
    wav = str(tmp_path_factory.mktemp("wav96") / "drop88k.wav")
    simulator.write_wav(wav, pcm, spec.fs)
    out = _assert_byte_parity(wav, tmp_path, label="decimate")
    assert b"Sampling frequency (fs): 44100.0 Hz" in out


def test_degraded_signal_processor_parity(tmp_path_factory):
    # Swapped mark/space makes every bit invert: headers fail, the
    # upstream report writer would crash (missing *coeff_default keys),
    # but the processor-level decode must still agree exactly.
    wav_dir = tmp_path_factory.mktemp("wav_degraded")
    spec = simulator.SimSpec(duration=40.0, profile_start=33.0, seed=5)
    pcm, _ = simulator.synthesize(spec)
    wav = str(wav_dir / "drop.wav")
    simulator.write_wav(wav, pcm, spec.fs)

    settings = {"mark_space_freqs": [800.0, 400.0]}
    ap = run_reference_processor(wav, settings=settings)
    mine = decode_wav(wav, settings=settings, compat="strict")

    assert mine.status == ap.status
    assert mine.firstpulse400 == ap.firstpulse400
    assert mine.profstartind == ap.profstartind
    assert list(mine.hexframes) == list(ap.hexframes)
    np.testing.assert_array_equal(np.asarray(mine.time), np.asarray(ap.time))
    np.testing.assert_array_equal(
        np.asarray(mine.temperature), np.asarray(ap.temperature))
    np.testing.assert_array_equal(
        np.asarray(mine.salinity), np.asarray(ap.salinity))
    for key in ("serial_no", "probe_code", "max_depth",
                "tcoeff", "ccoeff", "zcoeff",
                "tcoeff_valid", "ccoeff_valid", "zcoeff_valid"):
        assert mine.metadata[key] == ap.metadata[key], key


def test_fixed_mode_honors_flags(default_drop_wav):
    # In fixed mode -p works: an impossible 400 Hz threshold finds no pulse.
    wav, _ = default_drop_wav
    res = decode_wav(wav, settings={"minR400": 99.0}, compat="fixed")
    assert res.firstpulse400 == -1 and res.status == 0
    assert len(res.time) == 0


def test_timerange_trim_works(default_drop_wav):
    # -s/-e crash upstream (dead code); here they work.  Trimming 0.5 s off
    # the front shifts all timing by 0.5 s but the profile still decodes.
    wav, truth = default_drop_wav
    res = decode_wav(wav, timerange=[0, -1])
    res_trim = decode_wav(wav, timerange=[0, 45])
    assert res_trim.firstpulse400 == res.firstpulse400
    assert len(res_trim.time) > 100


def test_fixed_mode_bandpass_decodes(default_drop_wav):
    # -u is inert upstream; in fixed mode the 100-1200 Hz bandpass is real
    # and the drop must still decode end to end.
    wav, truth = default_drop_wav
    res = decode_wav(wav, settings={"use_bandpass": True}, compat="fixed")
    assert res.status == 2
    assert res.metadata["serial_no"] == truth["serial_no"]
    assert len(res.time) > 100


def test_long_file_byte_parity(tmp_path_factory, tmp_path):
    # 120 s drop: ~45 bit-aligned chunk advances after demod starts, so the
    # upstream buffer-index drift and chunk-grid semantics accumulate;
    # byte parity here means the chunk state machine is truly exact.
    spec = simulator.SimSpec(duration=120.0, profile_start=33.0, seed=21)
    pcm, _ = simulator.synthesize(spec)
    wav = str(tmp_path_factory.mktemp("wav120") / "drop120.wav")
    simulator.write_wav(wav, pcm, spec.fs)
    out = _assert_byte_parity(wav, tmp_path, label="long")
    assert out.count(b"\n") > 1500


def test_cubic_coefficients_parity(tmp_path_factory, tmp_path):
    # full cubic calibration sets (all four terms nonzero, mixed signs and
    # exponents) exercise every coefficient frame and the hex decode
    spec = simulator.SimSpec(
        duration=45.0, profile_start=33.0, seed=31,
        serial_hex="a1b2c3d4", max_depth_hex="07d0", probe_code_hex="a000",
        zcoeff=(1.2345678e-2, 2.5, -3.1e-4, 7.77e-8),
        tcoeff=(-0.5, 1.0203, 4.4e-5, -9.9e-9),
        ccoeff=(0.25, 0.98765, -1.1e-6, 2.2e-10),
    )
    pcm, truth = simulator.synthesize(spec)
    wav = str(tmp_path_factory.mktemp("wavcubic") / "cubic.wav")
    simulator.write_wav(wav, pcm, spec.fs)
    out = _assert_byte_parity(wav, tmp_path, label="cubic")
    assert b"Probe Serial: a1b2c3d4" in out
    assert b"(default)" not in out  # every coefficient set decoded


def test_noisy_signal_byte_parity(tmp_path_factory, tmp_path):
    # Heavy noise makes every demod decision borderline; byte parity here
    # proves the float64 accumulation orders match the upstream exactly
    # (any reordering flips some near-tie bit decision somewhere).
    spec = simulator.SimSpec(duration=45.0, profile_start=33.0, seed=41,
                             noise_rms=0.35)
    pcm, _ = simulator.synthesize(spec)
    wav = str(tmp_path_factory.mktemp("wavnoisy") / "noisy.wav")
    simulator.write_wav(wav, pcm, spec.fs)
    _assert_byte_parity(wav, tmp_path, label="noisy")


def test_diagnostics_columns(default_drop_wav, tmp_path):
    """--diagnostics appends R400/dR7500 columns; without it the output
    is unchanged (byte parity preserved by default)."""
    from axctdprocessor_tpu import cli

    wav, truth = default_drop_wav
    base, diag = str(tmp_path / "base.txt"), str(tmp_path / "diag.txt")
    assert cli.main(["-i", wav, "-o", base, "--quiet"]) == 0
    assert cli.main(["-i", wav, "-o", diag, "--quiet", "--diagnostics"]) == 0
    b, d = open(base).read().splitlines(), open(diag).read().splitlines()
    assert len(b) == len(d)
    hdr = next(i for i, l in enumerate(d) if l.startswith("Time (s)"))
    assert d[hdr].endswith(", R400, dR7500")
    assert b[hdr + 1] == d[hdr + 1][: len(b[hdr + 1])]
    assert d[hdr + 1].count(",") == b[hdr + 1].count(",") + 2
    # everything above the table is identical
    assert b[:hdr] == d[:hdr]
