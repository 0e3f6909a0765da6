"""Bit/int/hex codecs for AXCTD frames.

Vectorized counterparts of the reference's per-bit Python helpers
(reference parse.py:331-379): MSB-first bit<->int packing and the
4-bit-nibble hex string codec used for frame data and the report's hex
column.  NumPy versions serve the parity engine and the simulator's
encoder; JAX versions pack bits with a dot against a power-of-two vector
so frame fields decode as one small matmul on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_HEXCHARS = "0123456789abcdef"


def bits_to_int_np(bits) -> np.ndarray:
    """MSB-first bit vector(s) -> integer; last axis is the bit axis."""
    bits = np.asarray(bits, dtype=np.int64)
    w = 1 << np.arange(bits.shape[-1] - 1, -1, -1, dtype=np.int64)
    return bits @ w


def int_to_bits_np(value: int, width: int) -> np.ndarray:
    """Integer -> MSB-first bit vector of exactly `width` bits."""
    if value < 0 or value >= (1 << width):
        raise ValueError(f"{value} does not fit in {width} bits")
    return (value >> np.arange(width - 1, -1, -1)) & 1


def bits_to_hex_np(bits) -> str:
    """Bit list (length multiple of 4) -> lowercase hex string.

    Matches the reference's frame hex formatting (parse.py:363-379):
    nibble-at-a-time, MSB first, lowercase a-f.
    """
    bits = np.asarray(bits, dtype=np.int64)
    if bits.size % 4:
        raise ValueError("bit length must be a multiple of 4")
    nibbles = bits.reshape(-1, 4) @ np.array([8, 4, 2, 1], dtype=np.int64)
    return "".join(_HEXCHARS[n] for n in nibbles)


def hex_to_bits_np(hexstr: str) -> np.ndarray:
    """Lowercase/uppercase hex string -> MSB-first bit vector (encoder side)."""
    vals = [int(ch, 16) for ch in hexstr]
    return np.concatenate([int_to_bits_np(v, 4) for v in vals])


def bits_to_int(bits: jnp.ndarray) -> jnp.ndarray:
    """JAX MSB-first bit packing along the last axis (dot with 2^k weights)."""
    width = bits.shape[-1]
    w = jnp.asarray(1 << np.arange(width - 1, -1, -1), dtype=jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * w, axis=-1)


def frames_to_nibbles(frames: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) frame bits -> (N, 8) hex nibble values 0..15 (device side).

    The host formats nibbles to strings only at report time; keeping frame
    hex as small ints lets batched/vmapped decodes stay on device.
    """
    n = frames.shape[0]
    nib = frames.reshape(n, 8, 4).astype(jnp.int32)
    w = jnp.asarray([8, 4, 2, 1], dtype=jnp.int32)
    return jnp.sum(nib * w, axis=-1)


def nibbles_to_hex_np(nibbles) -> list[str]:
    """(N, 8) nibble values -> list of 8-char lowercase hex strings (host)."""
    nibbles = np.asarray(nibbles)
    return ["".join(_HEXCHARS[v] for v in row) for row in nibbles]
