"""CRC-6 and bit/hex codec tests, cross-checked against the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from axctdprocessor_tpu.ops import bits as bitops
from axctdprocessor_tpu.ops import crc

from ref_harness import load_reference_modules

# Example frame from the reference README.md:87 (known-valid)
README_FRAME = [int(b) for b in "10011100100001001000011111011110"]


def test_readme_frame_valid():
    assert crc.check_crc_np(README_FRAME)


def test_encode_roundtrip(rng):
    for _ in range(50):
        payload = rng.integers(0, 2, size=26)
        frame = crc.encode_crc_np(payload)
        assert crc.check_crc_np(frame)
        # flipping any single bit must invalidate the frame
        i = int(rng.integers(0, 32))
        bad = frame.copy()
        bad[i] ^= 1
        assert not crc.check_crc_np(bad)


def test_matches_reference_checker(rng):
    ref = load_reference_modules()
    for _ in range(100):
        frame = rng.integers(0, 2, size=32)
        assert bool(ref.parse.check_crc(list(frame))) == crc.check_crc_np(frame)


def test_all_windows_np_vs_scalar(rng):
    stream = rng.integers(0, 2, size=500)
    valid = crc.check_crc_all_windows_np(stream)
    for s in range(len(stream) - 31):
        assert valid[s] == crc.check_crc_np(stream[s : s + 32])


def test_all_windows_jax_matches_np(rng):
    stream = np.asarray(rng.integers(0, 2, size=512))
    v_np = crc.check_crc_all_windows_np(stream)
    v_jax = np.asarray(crc.check_crc_all_windows(jnp.asarray(stream)))
    np.testing.assert_array_equal(v_jax[: len(v_np)], v_np)
    assert not v_jax[len(v_np):].any()


def test_crc_words_matches_all_windows(rng):
    """check_crc_words over Horner-built frame words == the shifted-XOR
    sweep on the valid range (the profile stage derives CRC from the
    hexframe words it builds anyway, tpu_engine.stage2_core)."""
    stream = np.asarray(rng.integers(0, 2, size=512))
    n = len(stream)
    ext = np.concatenate([stream.astype(np.uint32), np.zeros(32, np.uint32)])
    word = np.zeros(n, np.uint32)
    for k in range(32):  # word[i] = sum_k bits[i+k] << (31-k)
        word = (word << np.uint32(1)) | ext[k : k + n]
    v_words = np.asarray(crc.check_crc_words(jnp.asarray(word)))
    v_ref = crc.check_crc_all_windows_np(stream)
    np.testing.assert_array_equal(v_words[: len(v_ref)], v_ref)
    # the tail (windows reading zero padding) is the callers' concern:
    # stage2 masks accept with idx < n_prof - 32 — an all-zero word IS
    # CRC-valid by construction, so verify the documented hazard exists
    assert crc.check_crc_words(jnp.zeros(4, jnp.uint32)).all()


def test_bits_roundtrip_and_reference_parity(rng):
    ref = load_reference_modules()
    for _ in range(20):
        width = int(rng.integers(1, 24))
        value = int(rng.integers(0, 1 << width))
        bl = bitops.int_to_bits_np(value, width)
        assert bitops.bits_to_int_np(bl) == value
        assert ref.parse.binListToInt(list(bl)) == value
    for _ in range(20):
        frame = rng.integers(0, 2, size=32)
        assert bitops.bits_to_hex_np(frame) == ref.parse.binListToHex(list(frame))
        assert np.array_equal(
            bitops.hex_to_bits_np(bitops.bits_to_hex_np(frame)), frame
        )


def test_frames_to_nibbles(rng):
    frames = np.asarray(rng.integers(0, 2, size=(8, 32)))
    nib = np.asarray(bitops.frames_to_nibbles(jnp.asarray(frames)))
    hexes = bitops.nibbles_to_hex_np(nib)
    for row, h in zip(frames, hexes):
        assert bitops.bits_to_hex_np(row) == h
