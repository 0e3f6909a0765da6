"""Segmented decode: fixed-shape segment programs + streamed upload.

The monolithic fused engine compiles one program per 15 s length bucket,
whose compile time and HBM footprint scale with file length (a >30 min
recording is one giant FFT graph, and every new bucket costs a
multi-minute remote compile).  This module bounds both:

* **stage 1 runs per ~24 s segment** with a fixed shape shared by every
  file length — one compilation, ever.  Each segment gets a raw left
  halo (IIR ring-in for the overlap-save FFT filter) and right halo
  (power-window straddle + crossing probes), the same halo math as the
  SP time-sharded path (parallel/timeshard.py), but sequential on one
  device instead of parallel over a mesh.
* **host->device upload streams per segment** while earlier segments
  compute — the dispatch queue is never blocked on the whole file's
  bytes (the transfer link, not compute, bounds single-file latency).
* the variable-size remainder (power smoothing, trigger, bit-edge
  chain, headers, profile) reuses the fused back half; its compile cost
  is bounded by padding the segment count to m*2^e buckets (mantissa
  m in 4..7, _bucket_count), so all file lengths share O(log) assemble
  programs with <= 25% padding.

Segment length is a whole number of power-window strides (keeping the
global 25 Hz window grid aligned across segment boundaries), chosen as
the largest that fits a SEG_NFFT = 2^20-point FFT with halos (~23.6 s
at 44.1 kHz) — see _seg_geometry.  >50 kHz WAVs decimate by 2 on device inside
each segment program (the halos absorb the zero-phase anti-alias
filter's ring), so long high-rate files keep both the streamed raw
upload and the bounded compile.

Decode results match the monolithic engine (same grid, same chain, same
back half); the only numeric difference is the overlap-save filter halo
versus one whole-file FFT (both approximate the same IIR to ~1e-6).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import chain as chain_ops
from ..ops import goertzel, iir
from ..utils.config import DecoderConfig
from . import tpu_engine as eng
from .parity_engine import DecodeResult

SEG_NFFT = 1 << 20          # per-segment FFT size (fixed pow2)
LEFT_HALO = 4096            # raw ring-in for the filter (transient < ~1k)
BIG = np.iinfo(np.int32).max // 2


def _seg_geometry(fs: float):
    """Segment geometry: the largest whole-stride segment whose haloed
    extension fits SEG_NFFT exactly (~23.6 s at 44.1 kHz).  Sizing the
    segment to the FFT rather than the FFT to the segment keeps the pow2
    pad waste at <1% (1500 strides paid a 4.19M-point FFT for a 2.65M
    extension, 1.58x the work).  2^20 was chosen by fresh-process A/B on
    the chip: 600 s decode 1.02-1.09 s vs 1.08-1.17 s at 2^21 and ~3.6 s
    at 2^22 (the 4M FFT is disproportionately slow)."""
    d_pcm = int(round(fs / 25))
    n_power = int(fs / 10)
    right = n_power  # covers window straddle and crossing-probe lookahead
    strides = (SEG_NFFT - LEFT_HALO - right) // d_pcm
    seg_len = strides * d_pcm
    c_seg = max(int(seg_len / fs * chain_ops.CROSSINGS_PER_SECOND) + 256,
                1024)
    return d_pcm, n_power, seg_len, right, c_seg


@functools.lru_cache(maxsize=8)
def _segment_program(fs: float, npcm: int, bit_inset: int, edge_pad: int,
                     integer_input: bool, decim2: bool = False,
                     wire4: bool = False):
    """One fixed-shape stage-1 segment program: conditioning,
    overlap-save FFT filter, tone powers on the global grid, crossings +
    per-crossing probes.  Compiled once per (fs, config geometry) for
    every file.  (A vmapped multi-segment-per-dispatch variant was
    A/B'd on chip at groups 2/4/8 and changed nothing — async-queued
    dispatch overhead is negligible — so one dispatch per segment
    stays.)

    With ``decim2`` (>50 kHz WAVs) the segment arrives at 2x the decode
    rate and is conditioned + zero-phase anti-alias decimated on device
    first (the segment form of tpu_engine.decimate2_on_device; the halos
    absorb the filter's symmetric ring).  ``fs`` is always the decode
    (post-decimation) rate; ``n_valid`` and ``k_off`` arrive at the raw
    rate and decode rate respectively."""
    d_pcm, n_power, seg_len, right, c_seg = _seg_geometry(fs)
    ext_len = LEFT_HALO + seg_len + right
    raw_mult = 2 if decim2 else 1
    in_len = ext_len * raw_mult
    nfft = iir.next_pow2(ext_len)

    def run(seg_ext, dc, peak, k_off, n_valid, ptrig, sos_arr, btrig,
            decim_sos):
        if wire4:
            x = eng.unpack_int4(seg_ext, in_len).astype(jnp.float32)
        elif integer_input:
            x = seg_ext.astype(jnp.float32)
        else:
            x = seg_ext
        gpos_raw = jnp.arange(in_len) + raw_mult * (k_off - LEFT_HALO)
        x = jnp.where((gpos_raw >= 0) & (gpos_raw < n_valid),
                      (x - dc) / peak, 0.0)
        nv_dec = (n_valid + raw_mult - 1) // raw_mult
        if decim2:
            nfft_d = iir.next_pow2(in_len)
            h = eng.sos_response_on_device(decim_sos, nfft_d)
            zero_phase = (h * jnp.conj(h)).real
            spec_d = jnp.fft.rfft(x, nfft_d) * zero_phase
            x = jnp.fft.irfft(spec_d, nfft_d)[:in_len][::2]
            gpos_ext = jnp.arange(ext_len) + (k_off - LEFT_HALO)
            x = jnp.where((gpos_ext >= 0) & (gpos_ext < nv_dec), x, 0.0)

        response = eng.sos_response_on_device(sos_arr, nfft)
        spec = jnp.fft.rfft(x, nfft) * response
        filt = jnp.fft.irfft(spec, nfft)[:ext_len].astype(jnp.float32)

        # tone powers on the global 25 Hz grid (raw; smoothing is global);
        # body length seg_len + n_power gives exactly seg_len/d_pcm windows
        body = x[LEFT_HALO : LEFT_HALO + seg_len + right]
        powers = goertzel.framed_tone_power_tiled(body, n_power, d_pcm,
                                                  ptrig)  # (strides, F)

        # crossings within [0, seg_len) local, global-position masked
        fbody = filt[LEFT_HALO:]
        sgn = jnp.where(fbody >= 0, 1, -1)
        is_c = sgn[:seg_len] != sgn[1 : seg_len + 1]
        gpos_blk = jnp.arange(seg_len) + k_off
        is_c &= (gpos_blk >= edge_pad) & (gpos_blk < nv_dec - 1)
        pos, cnt, rovf = chain_ops.compact_indices_rowcap(
            is_c, c_seg, BIG, row_cap=chain_ops.rowcap_for_fs(fs))
        probes = goertzel.tone_power_at(
            fbody, jnp.clip(pos, 0, seg_len - 1) + bit_inset, npcm, btrig)
        gpos = jnp.where(pos < BIG, pos + k_off, BIG).astype(jnp.int32)
        # ONE probe stream ships per crossing: the confidence ratio
        # space/max(mark, eps) carries both the bit decision and the
        # calibration histogram (eng.stage15_core) — half the probe
        # merge traffic and one fewer 660k gather in the assemble
        c0 = probes[:, 1] / jnp.maximum(probes[:, 0], 1e-30)
        # the true crossing count: the assemble program needs it for the
        # ragged merge (> c_seg signals truncation there; rovf flags a
        # row-cap truncation — a 128-sample run denser than the filter's
        # Rice bound — whose entries are missing even when cnt <= c_seg)
        return powers, gpos, c0, cnt, rovf

    return jax.jit(run)


def _assemble_body(powers_t, gpos_t, c0_t, cnt_t, rovf_t, n_valid, trig_i,
                   trig_f, hdr_rel, calib_off, coeff_defaults, temp_lut,
                   limits, dims, fs: float, bitrate: float):
    """Shared assemble body (traced inside jit): concatenate per-segment
    outputs, merge crossings, run the bit-edge chain, and hand off to
    the fused device back half.  ``*_t`` are sequences of per-segment
    buffers (rows of a stacked chunk are fine — static slices fuse)."""
    from jax import lax

    # powers: n_seg x (strides, F) -> global smoothed ratios
    p = jnp.concatenate(powers_t, axis=0)
    sm = [iir.boxsmooth_lag(p[:, i], 5) for i in range(3)]
    r400 = jnp.log10(sm[0] / sm[2])
    r7500 = jnp.log10(sm[1] / sm[2])

    # Segments are time-ordered and sorted within, and each row's
    # valid prefix length is known (cnt_t) — so the merge is a
    # RAGGED CONCATENATION: ascending fixed-size dynamic_update_slice
    # writes, each overwriting the previous row's BIG tail.  That is
    # ~8 MB of sequential writes, replacing a 2M-element mask
    # compaction + survivor gather (measured ~25 ms) and letting the
    # probe table merge alongside so the bit-edge probes gather
    # DIRECTLY (the composed slot re-gather cost another ~27 ms).
    k_seg = len(gpos_t)
    c_seg = gpos_t[0].shape[0]
    m = k_seg * c_seg
    cnt_seg = jnp.stack(cnt_t)
    cnts = jnp.minimum(cnt_seg, c_seg)
    coff = jnp.cumsum(cnts) - cnts
    n_cross = coff[-1] + cnts[-1]
    buf_g = jnp.full((m,), BIG, jnp.int32)
    buf_c0 = jnp.zeros((m,), c0_t[0].dtype)
    for k in range(k_seg):
        at = (coff[k],)
        buf_g = lax.dynamic_update_slice(buf_g, gpos_t[k], at)
        buf_c0 = lax.dynamic_update_slice(buf_c0, c0_t[k], at)
    g_s = jnp.where(jnp.arange(m) < n_cross, buf_g, BIG)

    edge_idx, n_edges = chain_ops.enumerate_bit_edges(
        g_s, n_cross, fs, bitrate, dims.max_edges)
    safe = jnp.clip(edge_idx, 0, m - 1)
    ovf0 = jnp.max(jnp.stack([(cnt_t[k] > c_seg).astype(jnp.int32)
                              | rovf_t[k].astype(jnp.int32)
                              for k in range(k_seg)]))
    return eng.back_half_core(
        r400, r7500, g_s[safe], n_edges, buf_c0[safe],
        n_valid, trig_i, trig_f, hdr_rel, calib_off, coeff_defaults,
        temp_lut, limits, dims, fs, overflow0=ovf0)


@functools.lru_cache(maxsize=8)
def _assemble_program(n_seg: int, dims, fs: float, bitrate: float):
    """Assemble over per-segment outputs passed as TUPLES of individual
    segment buffers (a pytree — jit flattens it), NOT pre-stacked
    arrays: the ragged merge writes each segment's buffer directly into
    the merged table, so the (n_seg, c_seg) stacks never materialize and
    the six eager ``jnp.stack`` dispatches (28 x ~8 MB of device copies
    per decode) disappear from the host loop."""

    def run(powers_t, gpos_t, c0_t, cnt_t, rovf_t, n_valid, trig_i,
            trig_f, hdr_rel, calib_off, coeff_defaults, temp_lut, limits):
        return _assemble_body(powers_t, gpos_t, c0_t, cnt_t, rovf_t,
                              n_valid, trig_i, trig_f, hdr_rel, calib_off,
                              coeff_defaults, temp_lut, limits, dims, fs,
                              bitrate)

    return jax.jit(run)


@functools.lru_cache(maxsize=8)
def _assemble_program_chunked(dims, fs: float, bitrate: float):
    """Assemble over CHUNK-STACKED segment outputs: each ``*_c`` input is
    a tuple of arrays with a leading chunk axis (the stacked outputs of a
    vmapped multi-segment dispatch).  Rows are read by static slice
    INSIDE the jit — slicing the stacks eagerly on the host would cost
    one tiny device dispatch per (segment x output), which is exactly
    the overhead grouped dispatch exists to remove."""

    def run(powers_c, gpos_c, c0_c, cnt_c, rovf_c, n_valid, trig_i,
            trig_f, hdr_rel, calib_off, coeff_defaults, temp_lut, limits):
        def rows(chunks):
            return [c[i] for c in chunks for i in range(c.shape[0])]

        return _assemble_body(rows(powers_c), rows(gpos_c), rows(c0_c),
                              rows(cnt_c), rows(rovf_c), n_valid, trig_i,
                              trig_f, hdr_rel, calib_off, coeff_defaults,
                              temp_lut, limits, dims, fs, bitrate)

    return jax.jit(run)


def _bucket_count(k: int) -> int:
    """Smallest m * 2^e >= k with mantissa m in {4..7} (exact below 4):
    segment counts share O(log) assemble programs (4 per octave, each a
    one-time cached compile) with <= 25% padding.  Pure pow2 padding
    wasted up to 2x — zero-padding segments feed the assemble chain's
    full-table squaring gathers, the decode's most expensive op."""
    if k <= 4:
        return max(k, 1)
    e = 0
    while (k + (1 << e) - 1) >> e > 7:
        e += 1
    return ((k + (1 << e) - 1) >> e) << e


def decode_waveform_segmented(pcm, fs, config: DecoderConfig | None = None,
                              dtype=jnp.float32,
                              wire: str = "auto",
                              timer=None) -> DecodeResult:
    """Decode with per-segment stage 1 (streamed upload, bounded compile).

    Same result contract as decode_waveform_tpu; integer input is
    conditioned on device with host-computed raw-int DC/peak statistics
    (the same float64 statistics the WAV reader uses).  ``wire`` selects
    the upload format for integer PCM (ops.wire; "auto" = noise-shaped
    int4 on real TPU), which matters most here — the segmented path
    exists to stream uploads under compute.  ``timer`` (an optional
    utils.profiling.StageTimer) splits the wall into encode / dispatch
    loop / assemble / fetch / host-finish stages for latency triage.
    """
    from ..utils.profiling import StageTimer

    timer = timer if timer is not None else StageTimer()
    cfg = config or DecoderConfig()
    pcm = np.asarray(pcm)
    if pcm.dtype == np.uint8:
        raise ValueError("pass unpacked integer PCM with wire='int4'; "
                         "pre-packed nibble streams lose the sample count")
    # >50 kHz input decimates by 2 on device, per segment; the report
    # prints the halved rate as a float (reference host `fs /= 2`)
    decim2 = float(fs) > 50000.0
    if decim2:
        fs = float(fs) / 2.0
        fs_report = fs
    else:
        fs_report = float(fs) if isinstance(fs, float) else int(fs)
        fs = float(fs)
    raw_mult = 2 if decim2 else 1
    n_raw = int(len(pcm))
    n = (n_raw + raw_mult - 1) // raw_mult  # decode-rate length
    d_pcm, n_power, seg_len, right, c_seg = _seg_geometry(fs)
    npcm = int(np.round(fs / cfg.bitrate * (1 - cfg.phase_error / 100))) - 2 * cfg.bit_inset

    integer_input = bool(np.issubdtype(pcm.dtype, np.integer))
    wire4 = False
    enc = None  # chunked int4 encoder (quantizes ahead of the uploads)
    t_prep = timer.stage("host_encode_stats")
    t_prep.__enter__()
    if integer_input:
        from ..ops import wire as wire_ops

        w = wire_ops.resolve_wire(wire, pcm.dtype)
        ext_len_chk = LEFT_HALO + seg_len + right
        if w == "int4" and (seg_len % 2 or ext_len_chk % 2):
            w = "int8"  # packed slicing needs even segment boundaries
        if w == "int4":
            # chunked C encoder: quantize ahead of the upload cursor so
            # the first segment transfer starts after ~6 ms, with the
            # remaining chunks running under the IO-bound wire drain
            # (closed-form dc/peak — see wire.ChunkedInt4Encoder)
            enc = wire_ops.chunked_int4_encoder(pcm)
            if enc is not None:
                pcm, dc, peak = enc.packed, enc.dc, enc.peak
            else:  # no native lib: one-shot pack + stats
                pcm, dc, peak = wire_ops.quantize_int4_packed_stats(pcm)
            wire4 = True
        else:
            pcm = wire_ops.encode(pcm, w)
            dc = float(np.mean(pcm))
            # min/max reductions, not np.abs (wraps at the int16 minimum)
            # and no waveform-sized temporary (fresh-page stall — see
            # ops.wire.int4_stats)
            peak = (float(max(int(pcm.max()), -int(pcm.min()), 1))
                    if n_raw else 1.0)
    else:
        w = "float32"  # conditioned float PCM ships verbatim
        dc, peak = 0.0, 1.0  # float input arrives conditioned
        pcm = pcm.astype(np.float32)

    n_seg = max(int(np.ceil(n / seg_len)), 1)
    n_seg_pad = _bucket_count(n_seg)
    dims = eng.EngineDims.for_waveform(n_seg_pad * seg_len, fs, cfg.bitrate,
                                       npcm)
    power_trig, bit_trig, sos = eng.engine_tables(cfg, fs, dims)

    seg_fn = _segment_program(fs, npcm, cfg.bit_inset, 100, integer_input,
                              decim2, wire4)
    pt = jnp.asarray(power_trig, jnp.float32)
    so = jnp.asarray(sos, jnp.float32)
    bt = jnp.asarray(bit_trig, jnp.float32)
    ds = jnp.asarray(iir.design_decim_sos() if decim2
                     else np.zeros((1, 6)), jnp.float32)
    dc_d = jnp.asarray(np.float32(dc))
    peak_d = jnp.asarray(np.float32(peak))
    # raw-rate count for the segment programs (conditioning mask), the
    # decode-rate count for the assemble/back half (its trigger derives
    # the real power-window grid from decode-rate n_power/d_pcm — a raw
    # count would extend it ~2x over bucket padding and could fire the
    # hard-timeout trigger on recordings too short for it)
    nv_raw = jnp.asarray(n_raw, jnp.int32)
    nv_dec = jnp.asarray(n, jnp.int32)

    ext_len = LEFT_HALO + seg_len + right
    in_len = ext_len * raw_mult
    # packed int4 slices in the byte domain (2 samples/byte; boundaries
    # are even by the geometry check above, only n_raw itself may be odd)
    pk = 2 if wire4 else 1
    buf_len = in_len // pk
    fill = np.uint8(0x88) if wire4 else pcm.dtype.type(0)

    def build_ext(k):
        lo = (k * seg_len - LEFT_HALO) * raw_mult
        hi = (k * seg_len + seg_len + right) * raw_mult
        ext = np.full(buf_len, fill, dtype=pcm.dtype)
        src_lo, src_hi = max(lo, 0), min(hi, n_raw)
        if src_hi > src_lo:
            ext[(src_lo - lo) // pk : (src_hi - lo + pk - 1) // pk] = \
                pcm[src_lo // pk : (src_hi + pk - 1) // pk]
        return ext

    t_prep.__exit__(None, None, None)
    # slot k >= n_seg is a zero segment: any content with an offset past
    # n_valid masks to silence (no crossings, zero powers); all padded
    # slots share one upload
    zero_ext = None
    outs = []
    with timer.stage("dispatch_loop"):
        for k in range(n_seg_pad):
            if k < n_seg:
                if enc is not None:
                    with timer.stage("  encode_chunks"):
                        enc.ensure((k * seg_len + seg_len + right) * raw_mult)
                with timer.stage("  build_upload"):
                    ext_arg = jnp.asarray(build_ext(k))
            else:
                if zero_ext is None:
                    zero_ext = jnp.asarray(np.full(buf_len, fill, pcm.dtype))
                ext_arg = zero_ext
            # async: segment k+1's upload streams while k computes
            outs.append(seg_fn(ext_arg, dc_d, peak_d,
                               jnp.asarray(min(k, n_seg) * seg_len, jnp.int32),
                               nv_raw, pt, so, bt, ds))

    with timer.stage("assemble_dispatch"):
        assemble = _assemble_program(n_seg_pad, dims, fs, float(cfg.bitrate))
        params = eng.fused_inputs(cfg, fs)
        out = assemble(*[tuple(o[i] for o in outs) for i in range(5)],
                       nv_dec, params["trig_i"], params["trig_f"],
                       params["hdr_rel"],
                       params["calib_off"], params["coeff_defaults"],
                       params["temp_lut"], params["limits"])
    with timer.stage("fetch"):
        host = jax.device_get(out)  # the decode's one blocking transfer
    with timer.stage("host_finish"):
        return eng.finish_result(host, fs_report, n, fs, cfg, wire_used=w)
