"""Batched (DP) and time-sharded (SP) decode on a virtual 8-device mesh."""

import numpy as np
import jax
import pytest

from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.models.tpu_engine import decode_waveform_tpu
from axctdprocessor_tpu.parallel import batch as pbatch
from axctdprocessor_tpu.parallel import timeshard
from axctdprocessor_tpu.parallel.mesh import make_mesh
from axctdprocessor_tpu.utils.wavio import read_wav


@pytest.fixture(scope="module")
def small_batch():
    """Three short drops with different profiles + serials (and one dud)."""
    drops = []
    for i, serial in enumerate(["00123456", "0abc1234", "deadbeef"]):
        spec = simulator.SimSpec(duration=42.0, profile_start=33.0, seed=20 + i,
                                 serial_hex=serial)
        pcm, truth = simulator.synthesize(spec)
        # condition like the WAV path (normalize)
        pcm = (pcm - np.mean(pcm)) / np.max(np.abs(pcm))
        drops.append((pcm.astype(np.float32), truth))
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(int(42.0 * 44100)) * 0.3).astype(np.float32)
    drops.append((noise, None))
    return drops


@pytest.mark.slow
def test_pad_batch_and_decode_dp(small_batch):
    pcms = pbatch.pad_batch([p for p, _ in small_batch])
    mesh = make_mesh({"dp": 4})
    results = pbatch.decode_batch(pcms, 44100.0, mesh=mesh)
    assert len(results) == 4
    for (pcm, truth), res in zip(small_batch, results):
        if truth is None:
            assert res.status == 0
            assert len(res.time) == 0
        else:
            assert res.status == 2
            assert res.metadata["serial_no"] == truth["serial_no"]
            assert len(res.time) > 100


@pytest.mark.slow
def test_batch_matches_single_device(small_batch):
    pcm, truth = small_batch[0]
    single = decode_waveform_tpu(pcm, 44100.0)
    batched = pbatch.decode_batch(pcm[None, :], 44100.0)[0]
    assert batched.metadata == single.metadata
    assert batched.hexframes == single.hexframes
    np.testing.assert_array_equal(batched.time, single.time)
    np.testing.assert_array_equal(batched.temperature, single.temperature)
    np.testing.assert_array_equal(batched.salinity, single.salinity)


def test_timeshard_decode(small_batch):
    mesh = make_mesh({"dp": 2, "sp": 4})
    pcms = pbatch.pad_batch([small_batch[0][0], small_batch[1][0]])
    results = timeshard.decode_batch_timesharded(pcms, 44100.0, mesh=mesh)
    for (pcm, truth), res in zip(small_batch[:2], results):
        assert res.status == 2
        assert res.metadata["serial_no"] == truth["serial_no"]
        assert len(res.time) > 100


@pytest.mark.slow
def test_timeshard_matches_single_device(small_batch):
    """SP decode must agree with the single-device fused engine on frames."""
    pcm, truth = small_batch[0]
    single = decode_waveform_tpu(pcm, 44100.0)
    mesh = make_mesh({"dp": 1, "sp": 8})
    res = timeshard.decode_batch_timesharded(pcm[None, :], 44100.0, mesh=mesh)[0]
    assert res.metadata == single.metadata
    assert res.firstpulse400 == single.firstpulse400
    a, b = set(res.hexframes), set(single.hexframes)
    assert len(a & b) / max(len(a | b), 1) > 0.95


@pytest.mark.slow
def test_int16_batch_matches_float(small_batch, default_drop_wav):
    """int16 batches (device conditioning) decode identically to float."""
    from scipy.io import wavfile

    wav, truth = default_drop_wav
    _, snd = wavfile.read(wav)
    raw = pbatch.pad_batch([snd, snd])
    assert raw.dtype == np.int16
    res_raw = pbatch.decode_batch(raw, 44100.0)
    pcm = (snd.astype(np.float64) - np.mean(snd)) / np.max(np.abs(snd))
    res_f32 = pbatch.decode_batch(pcm.astype(np.float32)[None], 44100.0)
    assert res_raw[0].metadata["serial_no"] == truth["serial_no"]
    assert res_raw[0].hexframes == res_f32[0].hexframes
    assert res_raw[0].hexframes == res_raw[1].hexframes


@pytest.mark.slow
def test_padded_int16_batch_conditioning(default_drop_wav):
    """Zero-padding + a DC offset must not skew device conditioning:
    a padded int16 row with `lengths` decodes like the unpadded file."""
    from scipy.io import wavfile

    wav, truth = default_drop_wav
    _, snd = wavfile.read(wav)
    snd = (snd + 500).astype(np.int16)  # inject a DC offset
    ref = pbatch.decode_batch(snd[None, :], 44100.0)[0]
    padded = np.zeros((1, len(snd) * 2), np.int16)
    padded[0, : len(snd)] = snd
    res = pbatch.decode_batch(padded, 44100.0, lengths=[len(snd)])[0]
    assert res.metadata["serial_no"] == truth["serial_no"]
    assert res.hexframes == ref.hexframes
    np.testing.assert_array_equal(res.temperature, ref.temperature)


@pytest.mark.slow
def test_timeshard_int16_device_conditioning(default_drop_wav):
    """Integer batches stay int16 across H2D in SP mode; the device
    psum/pmax row statistics must match host conditioning."""
    from scipy.io import wavfile

    wav, truth = default_drop_wav
    _, snd = wavfile.read(wav)
    snd = (snd + 500).astype(np.int16)  # DC offset exercises the psum mean
    mesh = make_mesh({"dp": 1, "sp": 8})
    res_raw = timeshard.decode_batch_timesharded(snd[None, :], 44100,
                                                 mesh=mesh)[0]
    pcm = ((snd.astype(np.float64) - np.mean(snd))
           / np.max(np.abs(snd))).astype(np.float32)
    res_f32 = timeshard.decode_batch_timesharded(pcm[None, :], 44100,
                                                 mesh=mesh)[0]
    assert res_raw.metadata["serial_no"] == truth["serial_no"]
    assert res_raw.hexframes == res_f32.hexframes
    np.testing.assert_array_equal(res_raw.temperature, res_f32.temperature)


@pytest.mark.slow
def test_timeshard_long_file():
    """SP exists for the longest files: a >300 s drop through the
    dp1 x sp8 front end (overlap-save FFT filtering per block — the
    associative-scan IIR was a compile-time trap at exactly this scale,
    tpu_engine.stage1_core's documented hazard) must decode correctly."""
    spec = simulator.SimSpec(duration=310.0, profile_start=33.0, seed=78)
    pcm, truth = simulator.synthesize(spec)
    x = ((pcm - np.mean(pcm)) / np.max(np.abs(pcm))).astype(np.float32)
    mesh = make_mesh({"dp": 1, "sp": 8})
    res = timeshard.decode_batch_timesharded(x[None, :], 44100.0,
                                             mesh=mesh)[0]
    assert res.status == 2
    assert res.metadata["serial_no"] == truth["serial_no"]
    assert res.overflow == 0
    n_expect = (310.0 - 33.0) * 25  # 25 frames/s of profile
    assert len(res.time) > 0.9 * n_expect
    assert res.time[-1] - res.time[0] > 0.9 * (310.0 - 33.0)


@pytest.mark.slow
def test_timeshard_low_fs_crossing_capacity():
    """Duration-based crossing capacity: a 16 kHz drop must decode the
    same time-sharded as single-device (a sample-count bound alone
    silently truncates crossings below ~13 kHz block rates)."""
    spec = simulator.SimSpec(fs=16000, duration=42.0, profile_start=33.0,
                             seed=77)
    pcm, truth = simulator.synthesize(spec)
    pcm = ((pcm - np.mean(pcm)) / np.max(np.abs(pcm))).astype(np.float32)
    single = decode_waveform_tpu(pcm, 16000)
    assert single.status == 2
    mesh = make_mesh({"dp": 1, "sp": 8})
    res = timeshard.decode_batch_timesharded(pcm[None, :], 16000,
                                             mesh=mesh)[0]
    assert res.status == 2
    assert res.metadata["serial_no"] == truth["serial_no"]
    a, b = set(res.hexframes), set(single.hexframes)
    assert len(a & b) / max(len(a | b), 1) > 0.95


@pytest.mark.slow
def test_pipeline_two_device_matches_batch(small_batch):
    """Front-end/back-half pipeline over two devices decodes identically
    to the single-device batched path, with the stages actually placed
    on different devices."""
    import jax

    from axctdprocessor_tpu.parallel.pipeline import decode_batches_pipelined

    pcms = pbatch.pad_batch([p for p, _ in small_batch])  # 4 drops
    batches = [(pcms[:2], [pcms.shape[1]] * 2), (pcms[2:], [pcms.shape[1]] * 2)]
    devs = jax.devices()[:2]
    piped = decode_batches_pipelined(batches, 44100.0, devices=devs)
    flat = [r for batch in piped for r in batch]

    ref = pbatch.decode_batch(pcms, 44100.0)
    assert len(flat) == len(ref) == 4
    for a, b in zip(flat, ref):
        assert a.status == b.status
        assert a.metadata == b.metadata
        assert a.hexframes == b.hexframes
        np.testing.assert_array_equal(a.time, b.time)
        np.testing.assert_array_equal(a.salinity, b.salinity)
