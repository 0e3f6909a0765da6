"""Streaming (push-based) decode must equal whole-file decode exactly."""

import numpy as np
import pytest

from axctdprocessor_tpu.models.parity_engine import decode_waveform
from axctdprocessor_tpu.models.stream import AXCTDStreamDecoder
from axctdprocessor_tpu.utils.wavio import read_wav


@pytest.mark.parametrize("chunking", ["uniform_1s", "ragged", "tiny_then_huge"])
def test_stream_equals_batch(default_drop_wav, rng, chunking):
    wav, _ = default_drop_wav
    pcm, fs = read_wav(wav)
    batch = decode_waveform(pcm, fs)

    dec = AXCTDStreamDecoder(fs)
    pos = 0
    while pos < len(pcm):
        if chunking == "uniform_1s":
            step = int(fs)
        elif chunking == "ragged":
            step = int(rng.integers(1000, 150000))
        else:
            step = 777 if pos < 10000 else len(pcm)
        dec.feed(pcm[pos : pos + step])
        pos += step
    res = dec.finalize()

    assert res.status == batch.status
    assert res.firstpulse400 == batch.firstpulse400
    assert res.profstartind == batch.profstartind
    assert res.metadata == batch.metadata
    assert res.hexframes == batch.hexframes
    np.testing.assert_array_equal(np.asarray(res.time), np.asarray(batch.time))
    np.testing.assert_array_equal(
        np.asarray(res.salinity), np.asarray(batch.salinity))


def test_latest_rows_incremental(default_drop_wav):
    wav, _ = default_drop_wav
    pcm, fs = read_wav(wav)
    dec = AXCTDStreamDecoder(fs)
    seen = 0
    got_rows_midstream = False
    for pos in range(0, len(pcm), int(2 * fs)):
        dec.feed(pcm[pos : pos + int(2 * fs)])
        rows = dec.latest_rows()
        seen += len(rows)
        if rows and pos < len(pcm) - int(4 * fs):
            got_rows_midstream = True
    dec.finalize()
    seen += len(dec.latest_rows())
    assert got_rows_midstream, "rows should appear before end of stream"
    batch = decode_waveform(pcm, fs)
    assert seen == len(batch.time)


def test_feed_after_finalize_raises(default_drop_wav):
    wav, _ = default_drop_wav
    pcm, fs = read_wav(wav)
    dec = AXCTDStreamDecoder(fs)
    dec.feed(pcm[: int(5 * fs)])
    dec.finalize()
    with pytest.raises(RuntimeError):
        dec.feed(pcm[: 100])


def test_checkpoint_resume(default_drop_wav, tmp_path):
    """Snapshot mid-stream, resume from disk -> identical final decode."""
    wav, _ = default_drop_wav
    pcm, fs = read_wav(wav)
    cut = int(20 * fs)

    ref = AXCTDStreamDecoder(fs)
    ref.feed(pcm[:cut])
    ref.feed(pcm[cut:])
    expected = ref.finalize()

    dec = AXCTDStreamDecoder(fs)
    dec.feed(pcm[:cut])
    ckpt = str(tmp_path / "decoder.ckpt")
    dec.save_checkpoint(ckpt)
    del dec

    resumed = AXCTDStreamDecoder.load_checkpoint(ckpt)
    resumed.feed(pcm[cut:])
    res = resumed.finalize()

    assert res.metadata == expected.metadata
    assert res.hexframes == expected.hexframes
    np.testing.assert_array_equal(np.asarray(res.time), np.asarray(expected.time))
    np.testing.assert_array_equal(
        np.asarray(res.salinity), np.asarray(expected.salinity))
