"""Header/profile codec equivalence against the reference implementation."""

import numpy as np
import pytest

from axctdprocessor_tpu.models import frames, simulator
from ref_harness import load_reference_modules


@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


def _random_header_stream(rng, drop_rate=0.0):
    """Pulse ones + encoded header + noise tail, with optional bit flips."""
    hdr = simulator.encode_header_frames().ravel()
    stream = np.concatenate([
        rng.integers(0, 2, size=rng.integers(30, 200)),
        np.ones(rng.integers(500, 1500), dtype=np.int64),
        hdr,
        rng.integers(0, 2, size=400),
    ])
    if drop_rate:
        flips = rng.random(len(stream)) < drop_rate
        stream = stream ^ flips
    return stream


def test_trim_header_matches(rng, ref):
    for trial in range(25):
        stream = _random_header_stream(rng, drop_rate=0.002 * (trial % 3))
        mine = frames.trim_header(stream)
        theirs = ref.parse.trim_header(list(stream))
        assert list(mine) == [int(b) for b in theirs], f"trial {trial}"


def test_trim_header_pure_noise(rng, ref):
    for _ in range(10):
        stream = rng.integers(0, 2, size=3000)
        mine = frames.trim_header(stream)
        theirs = ref.parse.trim_header(list(stream))
        assert list(mine) == [int(b) for b in theirs]


def test_parse_header_matches(rng, ref):
    for trial in range(15):
        stream = _random_header_stream(rng, drop_rate=0.001 * (trial % 4))
        bits = frames.trim_header(stream)
        # a corrupted-but-CRC-colliding coefficient frame can yield hex
        # digits in the decimal mantissa field; both implementations then
        # raise ValueError (upstream parse.py:278 does too) — crash parity
        try:
            theirs = ref.parse.parse_header([int(b) for b in bits])
        except ValueError:
            with pytest.raises(ValueError):
                frames.parse_header(bits)
            continue
        mine = frames.parse_header(bits)
        for key in ("serial_no", "probe_code", "max_depth", "frame_data",
                    "counter_found", "tcoeff", "ccoeff", "zcoeff",
                    "tcoeff_valid", "ccoeff_valid", "zcoeff_valid",
                    "tcoeff_hex", "ccoeff_hex", "zcoeff_hex"):
            assert mine[key] == theirs[key], (trial, key)


def test_profile_sync_matches(rng, ref):
    from axctdprocessor_tpu.utils.lut import load_temp_lut

    lut = load_temp_lut()
    tco, cco, zco = [0, 1, 0, 0], [0, 1, 0, 0], [0.72, 2.76124, -0.000238007, 0]
    for trial in range(10):
        n_frames = 40
        tints = rng.integers(100, 4000, size=n_frames)
        cints = rng.integers(0, 4096, size=n_frames)
        good = np.concatenate(
            [simulator.encode_profile_frame(t, c) for t, c in zip(tints, cints)]
        )
        stream = np.concatenate([
            rng.integers(0, 2, size=rng.integers(5, 64)), good,
            rng.integers(0, 2, size=37),
        ])
        # corrupt a few frames
        flips = rng.random(len(stream)) < (0.001 * (trial % 3))
        stream = stream ^ flips
        times = np.arange(len(stream), dtype=np.float64) / 800.0
        r400 = np.ones(len(stream) + 5)
        r7500 = np.ones(len(stream) + 5)
        r7500[rng.integers(0, len(stream), size=5)] = -1.0  # some rejected

        out = ref.parse.parse_bitstream_to_profile(
            [int(b) for b in stream], times, list(r400), list(r7500),
            list(lut), tco, cco, zco,
        )
        hex_ref, time_ref = out[0], out[1]
        consumed_ref = out[8]

        starts, consumed = frames.sync_profile_frames(stream, r7500)
        assert consumed == consumed_ref, trial
        assert len(starts) == len(hex_ref)
        from axctdprocessor_tpu.ops.bits import bits_to_hex_np

        hex_mine = [bits_to_hex_np(stream[s : s + 32]) for s in starts]
        assert hex_mine == hex_ref
        np.testing.assert_array_equal(times[starts], np.asarray(time_ref))
