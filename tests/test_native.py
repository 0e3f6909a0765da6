"""Native (C++) WAV ingest vs the scipy conditioning path."""

import numpy as np
import pytest

from axctdprocessor_tpu.utils import native
from axctdprocessor_tpu.utils.wavio import read_wav


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_wav_info(lib, default_drop_wav):
    path, truth = default_drop_wav
    fs, n, nch, bits = native.wav_info(path)
    assert fs == truth["spec"].fs
    assert nch == 1 and bits == 16
    assert n == int(truth["spec"].duration * fs)


def test_conditioned_read_matches_scipy(lib, default_drop_wav):
    path, _ = default_drop_wav
    fast = native.read_wav_conditioned_f32(path)
    assert fast is not None
    pcm_fast, fs_fast = fast
    pcm_ref, fs_ref = read_wav(path)
    assert fs_fast == fs_ref
    assert pcm_fast.dtype == np.float32
    np.testing.assert_allclose(pcm_fast, pcm_ref.astype(np.float32),
                               rtol=0, atol=2e-7)


def test_stereo_channel0(lib, tmp_path, rng):
    from scipy.io import wavfile

    left = (rng.standard_normal(5000) * 10000).astype(np.int16)
    right = (rng.standard_normal(5000) * 10000).astype(np.int16)
    path = str(tmp_path / "stereo.wav")
    wavfile.write(path, 44100, np.stack([left, right], axis=1))
    pcm_fast, fs = native.read_wav_conditioned_f32(path)
    pcm_ref, _ = read_wav(path)
    np.testing.assert_allclose(pcm_fast, pcm_ref.astype(np.float32),
                               rtol=0, atol=2e-7)


def test_high_rate_falls_back(lib, tmp_path, rng):
    # >50 kHz needs the scipy decimator; the native fast path declines
    from scipy.io import wavfile

    path = str(tmp_path / "hi.wav")
    wavfile.write(path, 88200, (rng.standard_normal(2000) * 1000).astype(np.int16))
    assert native.read_wav_conditioned_f32(path) is None


def test_garbage_file(lib, tmp_path):
    path = str(tmp_path / "junk.wav")
    open(path, "wb").write(b"not a wav at all, definitely")
    assert native.wav_info(path) is None
    assert native.read_wav_conditioned_f32(path) is None
