"""Robustness sweeps: noise degradation, missing tone, timeout trigger."""

import numpy as np
import pytest

from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.models.parity_engine import decode_waveform
from axctdprocessor_tpu.models.tpu_engine import decode_waveform_tpu
from axctdprocessor_tpu.utils.config import resolve_settings


def _drop(noise_rms, tone_amp=0.35, seed=0, duration=42.0):
    spec = simulator.SimSpec(duration=duration, profile_start=33.0,
                             noise_rms=noise_rms, tone7500_amp=tone_amp,
                             seed=seed)
    pcm, truth = simulator.synthesize(spec)
    pcm = (pcm - np.mean(pcm)) / np.max(np.abs(pcm))
    return pcm.astype(np.float32), truth, spec


@pytest.mark.parametrize("noise_rms", [
    pytest.param(0.05, marks=pytest.mark.slow),  # ~120 s: worst-SNR decode
    pytest.param(0.25, marks=pytest.mark.slow),  # ~125 s: mid-SNR; 0.5 stays in the fast gate
    0.5])
def test_snr_degradation_graceful(noise_rms):
    """Higher noise loses frames (CRC rejection) but never corrupts rows."""
    pcm, truth, spec = _drop(noise_rms)
    res = decode_waveform_tpu(pcm, spec.fs)
    assert res.status == 2
    truth_set = set(truth["frame_hex"])
    if res.hexframes:
        in_truth = sum(1 for h in res.hexframes if h in truth_set)
        # CRC-valid decoded frames are essentially always true frames
        assert in_truth / len(res.hexframes) > 0.95
    if noise_rms <= 0.05:
        assert len(res.time) > 150
        assert res.metadata["serial_no"] == truth["serial_no"]
    # QC'd values always within physical bounds
    for t in res.temperature:
        assert -10 <= t <= 50
    for s in res.salinity:
        assert -1 <= s <= 100


def test_timeout_trigger_fixed_mode():
    """With no 7500 Hz tone, fixed mode -b triggers at the hard timeout."""
    pcm, truth, spec = _drop(0.05, tone_amp=0.0, duration=48.0)
    cfg = resolve_settings({"triggerrange": [30, 40]}, compat="fixed")
    for decode in (decode_waveform, decode_waveform_tpu):
        res = decode(pcm, spec.fs, config=cfg)
        assert res.status == 2, decode.__name__
        expected = res.firstpulse400 + int(spec.fs * 40)
        assert res.profstartind == expected, decode.__name__
        # no 7500 signal -> every frame fails the r7500 gate
        assert len(res.time) == 0, decode.__name__


def test_timeout_dead_in_strict_mode():
    """Upstream quirk: with a valid baseline the hard timeout never fires."""
    pcm, truth, spec = _drop(0.05, tone_amp=0.0, duration=48.0)
    cfg = resolve_settings(None, compat="strict")
    cfg.trigger_range = [30, 40]  # force-enable to show it still won't fire
    res = decode_waveform(pcm, spec.fs, config=cfg)
    assert res.status == 1
    assert res.profstartind == -1


@pytest.mark.parametrize("freq_error", [-0.003, 0.003])
def test_transmitter_frequency_drift(freq_error):
    """Crystal drift of +/-0.3% (baud + tones) must still decode: the
    zero-crossing tracker follows the actual bit cadence."""
    spec = simulator.SimSpec(duration=42.0, profile_start=33.0, seed=8,
                             freq_error=freq_error)
    pcm, truth = simulator.synthesize(spec)
    pcm = ((pcm - np.mean(pcm)) / np.max(np.abs(pcm))).astype(np.float32)
    res = decode_waveform_tpu(pcm, spec.fs)
    assert res.status == 2
    assert res.metadata["serial_no"] == truth["serial_no"]
    assert len(res.time) > 150
    truth_set = set(truth["frame_hex"])
    in_truth = sum(1 for h in res.hexframes if h in truth_set)
    assert in_truth / max(len(res.hexframes), 1) > 0.95
