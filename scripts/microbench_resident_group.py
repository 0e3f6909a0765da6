#!/usr/bin/env python3
"""Device-resident A/B: dispatch grouping for the 600 s decode.

Round 2 recorded grouped dispatch (2/4/8 segments) as a null result —
but that was when wall was ~930 ms and segment compute ~9 ms.  With
segment compute now ~2.7 ms, the relay's ~2.6 ms per-dispatch overhead
is a real fraction of a ~150 ms resident decode; round 4's re-run found
g4 a clear win (173.7 -> 148.2 ms) and it now ships as segmented.GROUP.
Usage: ONE mode per fresh process (relay decode walls drift 2-3x within
a process):

    microbench_resident_group.py loop | gN | vmap | tput | public

  loop    one dispatch per segment + the tuple assemble
  gN      vmapped chunks of N segments + the chunked assemble (g4 = the
          shipped group size)
  vmap    one chunk of ALL segments — KNOWN BAD on the relay: at >= 14
          segments per dispatch the batched-FFT path returns wrong tone
          powers on later rows (and it is slower anyway); kept only to
          re-check that bound after relay updates
  tput    g4 + sustained K-deep pipelined throughput
  public  the shipped API end to end: segmented.prestage_waveform +
          PrestagedDrop.decode (should match g4 within noise — if it
          does not, the product path has drifted from the bench)
  fused   prestage_waveform(fused=True): the whole decode as ONE
          dispatch (lax.map over 4-segment chunks) — removes the
          n_chunk per-chunk dispatch boundaries
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np
import jax
import jax.numpy as jnp

from axctdprocessor_tpu.models import segmented, simulator, tpu_engine as eng
from axctdprocessor_tpu.ops import wire as wire_ops
from axctdprocessor_tpu.utils.config import DecoderConfig

FS = 44100.0
WAV_SECONDS = 600.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "loop"
    if not (mode in ("loop", "vmap", "tput", "public", "fused")
            or (mode.startswith("g") and mode[1:].isdigit())):
        raise SystemExit(f"unknown mode {mode!r}: want loop|gN|vmap|tput"
                         f"|public|fused (see module docstring)")
    print("backend:", jax.default_backend(), "mode:", mode)
    cfg = DecoderConfig()
    spec = simulator.SimSpec(duration=WAV_SECONDS, profile_start=33.0,
                             seed=11)
    pcm, _ = simulator.synthesize(spec)
    raw = np.round(pcm * 28000 / np.max(np.abs(pcm))).astype(np.int16)
    q = wire_ops.quantize_int8(raw)
    n = len(q)

    if mode in ("public", "fused"):
        st = segmented.prestage_waveform(raw, FS, wire="int8",
                                         fused=(mode == "fused"))
        res = st.decode()  # warmup
        print("decode:", res.status, len(res.hexframes), "frames")
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            jax.device_get(st.dispatch())
            best = min(best, time.perf_counter() - t0)
        print(f"resident wall ({mode}): {best*1e3:.1f} ms "
              f"-> {WAV_SECONDS/best:.0f}x realtime")
        K = 4
        best_k = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            outs_k = [st.dispatch() for _ in range(K)]
            for o in outs_k:
                jax.device_get(o)
            best_k = min(best_k, (time.perf_counter() - t0) / K)
        print(f"resident tput ({K} back-to-back): {best_k*1e3:.1f} ms/drop "
              f"-> {WAV_SECONDS/best_k:.0f}x realtime")
        return

    d_pcm, n_power, seg_len, right, c_seg = segmented._seg_geometry(FS)
    npcm = (int(np.round(FS / cfg.bitrate * (1 - cfg.phase_error / 100)))
            - 2 * cfg.bit_inset)
    ext_len = segmented.LEFT_HALO + seg_len + right
    n_seg = max(int(np.ceil(n / seg_len)), 1)
    n_seg_pad = segmented._bucket_count(n_seg)
    dims = eng.EngineDims.for_waveform(n_seg_pad * seg_len, FS, cfg.bitrate,
                                       npcm)
    power_trig, bit_trig, sos = eng.engine_tables(cfg, FS, dims)
    seg_fn = segmented._segment_program(FS, npcm, cfg.bit_inset, 100, True)
    pt, so, bt = (jnp.asarray(a, jnp.float32)
                  for a in (power_trig, sos, bit_trig))
    ds = jnp.asarray(np.zeros((1, 6)), jnp.float32)
    dc = jnp.asarray(np.float32(np.mean(q)))
    peak = jnp.asarray(np.float32(max(int(q.max()), -int(q.min()), 1)))
    nv = jnp.asarray(n, jnp.int32)

    def build_ext(k):
        lo = k * seg_len - segmented.LEFT_HALO
        hi = k * seg_len + seg_len + right
        ext = np.zeros(ext_len, q.dtype)
        s_lo, s_hi = max(lo, 0), min(hi, n)
        ext[s_lo - lo : s_hi - lo] = q[s_lo:s_hi]
        return ext

    exts_np = np.stack([build_ext(k) if k < n_seg else
                        np.zeros(ext_len, q.dtype)
                        for k in range(n_seg_pad)])
    koffs_np = np.asarray([min(k, n_seg) * seg_len
                           for k in range(n_seg_pad)], np.int32)
    assemble = segmented._assemble_program(n_seg_pad, dims, FS,
                                           float(cfg.bitrate))
    params = eng.fused_inputs(cfg, FS)

    if mode == "loop":
        exts = [jax.device_put(jnp.asarray(exts_np[k]))
                for k in range(n_seg_pad)]
        koffs = [jnp.asarray(int(koffs_np[k])) for k in range(n_seg_pad)]

        def run():
            outs = [seg_fn(exts[k], dc, peak, koffs[k], nv, pt, so, bt, ds)
                    for k in range(n_seg_pad)]
            out = assemble(*[tuple(o[i] for o in outs) for i in range(5)],
                           nv, params["trig_i"], params["trig_f"],
                           params["hdr_rel"], params["calib_off"],
                           params["coeff_defaults"], params["temp_lut"],
                           params["limits"])
            return jax.device_get(out)
    else:
        # grouped dispatch: vmap the segment program over chunks of g
        # segments (mode "gN"; "vmap" = one chunk of all segments), and
        # feed the chunk STACKS straight into the chunked assemble — row
        # slicing happens inside that jit, not as eager device ops.
        g = (n_seg_pad if mode == "vmap"
             else 4 if mode == "tput" else int(mode[1:]))
        n_chunk = (n_seg_pad + g - 1) // g
        pad_to = n_chunk * g
        if pad_to > n_seg_pad:  # pad with ZERO segments (cnt=0 rows)
            exts_np = np.concatenate(
                [exts_np, np.zeros((pad_to - n_seg_pad, ext_len),
                                   exts_np.dtype)])
            koffs_np = np.concatenate(
                [koffs_np, np.full(pad_to - n_seg_pad, n_seg * seg_len,
                                   np.int32)])
        chunks = [jax.device_put(jnp.asarray(exts_np[j * g:(j + 1) * g]))
                  for j in range(n_chunk)]
        kchunks = [jax.device_put(jnp.asarray(koffs_np[j * g:(j + 1) * g]))
                   for j in range(n_chunk)]
        vseg = jax.jit(jax.vmap(
            seg_fn, in_axes=(0, None, None, 0, None, None, None, None,
                             None)))
        asm_chunk = segmented._assemble_program_chunked(
            dims, FS, float(cfg.bitrate))

        def run_async():
            outs = [vseg(chunks[j], dc, peak, kchunks[j], nv, pt, so, bt,
                         ds) for j in range(n_chunk)]
            return asm_chunk(*[tuple(o[i] for o in outs)
                               for i in range(5)],
                             nv, params["trig_i"], params["trig_f"],
                             params["hdr_rel"], params["calib_off"],
                             params["coeff_defaults"], params["temp_lut"],
                             params["limits"])

        def run():
            return jax.device_get(run_async())

    host = run()  # warmup
    res = eng.finish_result(host, 44100, n, FS, cfg)
    print("decode:", res.status, len(res.hexframes), "frames")
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"resident wall ({mode}): {best*1e3:.1f} ms "
          f"-> {WAV_SECONDS/best:.0f}x realtime")

    if mode == "tput":
        # sustained resident THROUGHPUT: K back-to-back decodes queued
        # with every result fetched only after the last dispatch — the
        # fetch of decode i rides under decode i+1's device compute,
        # exactly how a corpus/archive job consumes the chip.  Per-drop
        # wall is the honest steady-state number for bulk reprocessing.
        K = 4
        best_k = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            outs_k = [run_async() for _ in range(K)]
            for o in outs_k:
                jax.device_get(o)
            best_k = min(best_k, (time.perf_counter() - t0) / K)
        print(f"resident tput ({K} back-to-back): {best_k*1e3:.1f} ms/drop "
              f"-> {WAV_SECONDS/best_k:.0f}x realtime")

    # wall split (loop mode): host enqueue / device-complete (forced by a
    # 4-byte fetch — block_until_ready is unreliable on the relay) / full
    # result fetch.  Times the LAST run's phases; min over repeats.
    if mode == "loop":
        def run_async():
            outs = [seg_fn(exts[k], dc, peak, koffs[k], nv, pt, so, bt, ds)
                    for k in range(n_seg_pad)]
            return assemble(*[tuple(o[i] for o in outs) for i in range(5)],
                            nv, params["trig_i"],
                            params["trig_f"], params["hdr_rel"],
                            params["calib_off"], params["coeff_defaults"],
                            params["temp_lut"], params["limits"])

        b_enq = b_dev = b_fetch = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            out = run_async()
            t1 = time.perf_counter()
            _ = int(jax.device_get(out[0]))   # forces device completion
            t2 = time.perf_counter()
            _ = jax.device_get(out)
            t3 = time.perf_counter()
            b_enq = min(b_enq, t1 - t0)
            b_dev = min(b_dev, t2 - t1)
            b_fetch = min(b_fetch, t3 - t2)
        print(f"split: enqueue {b_enq*1e3:.1f} ms | device(+lat) "
              f"{b_dev*1e3:.1f} ms | result fetch {b_fetch*1e3:.1f} ms")


if __name__ == "__main__":
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _artifact import record_runs

    record_runs("resident_group", main)
