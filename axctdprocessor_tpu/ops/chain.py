"""Pointer-doubling chain enumeration — parallelizing the sequential loops.

Two stages of the decode are inherently sequential in the reference:

* the greedy bit-edge chain over zero crossings (demodulate.py:85-93):
  from the current crossing, hop to whichever of the next four crossings
  is nearest to one bit period ahead;
* profile/header frame sync (parse.py:57-89): advance 1 bit on a reject,
  32 bits on an accepted frame.

Both are successor functions ``next(i)`` whose value is computable for
ALL positions in parallel (the candidates/validities don't depend on the
path taken).  The chain from a start node is then enumerated with path
doubling: knowing ``chain[0:2^p]`` and the 2^p-step jump table
``J_p = next^(2^p)``, the next block is one vectorized gather
``chain[2^p : 2^{p+1}] = J_p[chain[0 : 2^p]]``, and ``J_{p+1} = J_p[J_p]``.
O(log N) gathers of O(N) instead of an O(N) sequential scan — the core
trick that makes whole-waveform decode latency-viable on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def compact_indices(mask: jnp.ndarray, size: int, fill: int):
    """Indices of True entries, compacted into a fixed-size buffer.

    Equivalent to ``jnp.where(mask, size=size, fill_value=fill)`` but
    lowered as cumsum + scatter, which measures ~40% faster on TPU than
    the stock bounded-nonzero lowering at waveform sizes.  Returns
    (indices int32[size], true_count).
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask, jnp.minimum(pos, size), size)
    out = jnp.full((size + 1,), fill, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return out[:size], pos[-1] + 1


def chain_enumerate(next_idx: jnp.ndarray, start, length: int,
                    max_level: int | None = None) -> jnp.ndarray:
    """Iterate ``chain[j+1] = next_idx[chain[j]]`` for `length` steps.

    `next_idx` must map fixed points to themselves at chain ends; the
    returned array then repeats the terminal value after termination.

    The jump table is squared only up to ``2^max_level`` steps: each
    squaring is a random gather over the FULL table (the dominant cost —
    ~20 ms per level at 2.4M entries on TPU), while extending the chain
    with an existing table costs only the chain's own length.  Capping
    the levels and sliding a 2^max_level window over the tail trades a
    few dozen cheap extension gathers for the most expensive squarings
    (~35% of chain wall time at 600 s scale).
    """
    k = int(length)
    if max_level is None:
        # bound the unrolled tail-extension count to ~128 HLO gathers
        max_level = max(12, (k - 1).bit_length() - 7)
    chain = jnp.zeros((k,), dtype=jnp.int32).at[0].set(start)
    jumps = next_idx.astype(jnp.int32)
    filled, span = 1, 1  # invariant: jumps == next^span, chain[:filled] done
    while filled < k:
        take = min(span, k - filled)
        seg = jumps[chain[filled - span : filled - span + take]]
        chain = lax.dynamic_update_slice(chain, seg, (filled,))
        filled += take
        if filled < k and span < (1 << max_level) and 2 * span <= filled:
            jumps = jumps[jumps]
            span *= 2
    return chain


def bit_edge_successors(crossings: jnp.ndarray, n_valid, fs: float,
                        bitrate: float) -> jnp.ndarray:
    """Successor table for the greedy 4-candidate bit-edge chain.

    `crossings` is a padded (static-size M) ascending array of crossing
    sample indices with a large filler after position `n_valid`.  The
    successor of i is i + 1 + argmin over the next four crossings of
    their distance to crossings[i] + fs/bitrate; positions with fewer
    than 5 crossings remaining (the reference's loop bound) are fixed
    points.
    """
    m = crossings.shape[0]
    big = jnp.asarray(np.iinfo(np.int32).max // 2, dtype=crossings.dtype)
    padded = jnp.concatenate([crossings, jnp.full((5,), big, crossings.dtype)])
    cand = jnp.stack([padded[s : s + m] for s in range(1, 5)], axis=1)  # (M, 4)
    # distances computed on small integer gaps first — comparing absolute
    # sample positions in f32 would quantize by ~2 samples on long files
    gaps = (cand - crossings[:, None]).astype(jnp.float32)
    target = jnp.asarray(fs / bitrate, jnp.float32)
    pick = jnp.argmin(jnp.abs(gaps - target), axis=1)
    idx = jnp.arange(m, dtype=jnp.int32)
    nxt = idx + 1 + pick.astype(jnp.int32)
    nxt = jnp.where(idx < n_valid - 5, nxt, idx)  # chain stops at c >= m-5
    return jnp.clip(nxt, 0, m - 1)


def enumerate_bit_edges(crossings: jnp.ndarray, n_valid, fs: float,
                        bitrate: float, max_edges: int):
    """Chained bit edges (values from `crossings`) + count of valid edges.

    Returns (edge_positions[max_edges] as crossing-array indices,
    n_edges).  Entry j beyond n_edges repeats the terminal index.
    """
    nxt = bit_edge_successors(crossings, n_valid, fs, bitrate)
    chain = chain_enumerate(nxt, jnp.asarray(0, jnp.int32), max_edges)
    # valid while strictly advancing
    advanced = jnp.concatenate(
        [jnp.ones((1,), bool), chain[1:] > chain[:-1]]
    )
    n_edges = jnp.sum(jnp.cumprod(advanced.astype(jnp.int32)))
    return chain, n_edges


def frame_sync_successors(accept: jnp.ndarray, n_bits) -> jnp.ndarray:
    """Successor table for frame sync: +32 on accept, +1 on reject.

    Positions at or beyond n_bits - 32 are fixed points (the reference's
    ``while s < numbits - 32``)."""
    n = accept.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    nxt = jnp.where(accept, idx + 32, idx + 1)
    nxt = jnp.where(idx < n_bits - 32, nxt, idx)
    return jnp.clip(nxt, 0, n - 1)


def enumerate_frames(accept: jnp.ndarray, n_bits, max_steps: int,
                     max_frames: int):
    """Run frame sync over the whole bitstream at once.

    Returns (frame_starts[max_frames], n_frames, consumed) where
    `consumed` is the scan's final position (bits to drop from a
    streaming buffer).  `accept` is the precomputed per-offset frame
    validity ('10' prefix + CRC + signal gate).
    """
    nxt = frame_sync_successors(accept, n_bits)
    chain = chain_enumerate(nxt, jnp.asarray(0, jnp.int32), max_steps)
    advancing = jnp.concatenate([jnp.ones((1,), bool), chain[1:] > chain[:-1]])
    on_chain = jnp.cumprod(advancing.astype(jnp.int32)).astype(bool)
    is_frame = on_chain & accept[jnp.clip(chain, 0, accept.shape[0] - 1)] \
        & (chain < n_bits - 32)
    n_frames = jnp.sum(is_frame.astype(jnp.int32))
    # stable-order extraction of frame starts into a fixed-size buffer
    order = jnp.where(is_frame, jnp.cumsum(is_frame.astype(jnp.int32)) - 1,
                      max_frames)
    starts = jnp.full((max_frames + 1,), jnp.int32(0)).at[order].set(chain, mode="drop")
    consumed = chain[-1]
    return starts[:max_frames], n_frames, consumed
