"""processAXCTD-compatible command line interface.

Same flags and defaults as the reference CLI (processAXCTD.py:47-101):

  -i/--input, -o/--output, -s/--starttime, -e/--endtime,
  -a/--autodetect-start, -b/--autodetect-end, -p/--sig-threshold-400,
  -t/--sig-threshold-7500, -d/--dead-freq, -l/--pointsperloop,
  -m/--mark-freq, -n/--space-freq, -u/--use-bandpass

Two compatibility modes (see utils.config):

* default (strict): the reference's *effective* flag semantics — the
  settings-key mismatch leaves -p/-t/-l/-u inert and -a/-b pinned, so
  output is byte-identical to upstream;
* ``--fixed-settings``: every flag does what its help text says.

Unlike upstream, -s/-e time windowing actually works (it is dead code
that raises NameError there), and the engine to use is selectable with
``--engine {parity,tpu}``.
"""

from __future__ import annotations

import argparse
import os
import sys

from .models.parity_engine import decode_wav
from .utils.config import resolve_settings
from .utils.report import write_report
from .utils.timeparse import parse_time_string


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="processAXCTD", description="Demodulate an AXCTD audio file to text"
    )
    p.add_argument("-i", "--input", default="ERROR_NO_FILE_SPECIFIED",
                   help="Input WAV filename")
    p.add_argument("-o", "--output", default="output.txt", help="Output filename")
    p.add_argument("-s", "--starttime", default="0", help="AXCTD start time in WAV file")
    p.add_argument("-e", "--endtime", default="-1", help="AXCTD end time in WAV file")
    p.add_argument("-a", "--autodetect-start", default="30",
                   help="Earliest time to scan for profile transmission start")
    p.add_argument("-b", "--autodetect-end", default="-1",
                   help="Latest time to scan for profile transmission start")
    p.add_argument("-p", "--sig-threshold-400", default="2",
                   help="Normalized 400 Hz signal threshold for pulse detection")
    p.add_argument("-t", "--sig-threshold-7500", default="1.5",
                   help="Normalized 7500 Hz signal threshold for profile detection")
    p.add_argument("-d", "--dead-freq", default="3000",
                   help='"Dead" (quiet) frequency for signal-level normalization (Hz)')
    p.add_argument("-l", "--pointsperloop", default="100000",
                   help="PCM points processed per iteration")
    p.add_argument("-m", "--mark-freq", default="400", help="Mark (bit 1) frequency (Hz)")
    p.add_argument("-n", "--space-freq", default="800", help="Space (bit 0) frequency (Hz)")
    p.add_argument("-u", "--use-bandpass", action="store_true",
                   help="Use a 100-1200 Hz bandpass instead of the 1200 Hz lowpass")
    p.add_argument("--fixed-settings", action="store_true",
                   help="Honor all flags as documented instead of reproducing the "
                        "reference's effective (partially inert) flag semantics")
    p.add_argument("--engine", choices=["parity", "tpu"], default="parity",
                   help="Decode engine: byte-parity host engine or fused TPU engine")
    p.add_argument("--corpus", metavar="DIR_OR_GLOB",
                   help="Archive mode: decode every WAV in a directory (or glob) "
                        "with the batched TPU pipeline; -o names the output dir")
    p.add_argument("--batch-size", type=int, default=8,
                   help="Drops per device batch in archive mode")
    p.add_argument("--no-resume", action="store_true",
                   help="Archive mode: re-decode files already in the manifest")
    p.add_argument("--wire", choices=["auto", "int16", "int8", "int4"],
                   default="auto",
                   help="TPU-engine upload format for integer PCM: int8 "
                        "halves the host->device bytes (decode-equivalent); "
                        "int4 quarters them (lossy opt-in, ~26 dB SNR); "
                        "auto picks noise-shaped int4 on real TPU hardware")
    p.add_argument("--quiet", action="store_true", help="Suppress progress output")
    p.add_argument("--diagnostics", action="store_true",
                   help="Append per-point R400/dR7500 signal columns to the "
                        "profile table (default output is byte-identical "
                        "to the upstream format)")
    return p


def _run_corpus(args) -> int:
    import glob as globmod

    from .parallel.archive import reprocess_corpus

    pattern = args.corpus
    if os.path.isdir(pattern):
        pattern = os.path.join(pattern, "*.wav")
    paths = sorted(globmod.glob(pattern))
    if not paths:
        print(f"[!] No WAV files match {args.corpus!r}")
        return 1
    out_dir = args.output if args.output != "output.txt" else "corpus_out"
    settings = {
        "deadfreq": float(args.dead_freq),
        "mark_space_freqs": [float(args.mark_freq), float(args.space_freq)],
        "minR400": float(args.sig_threshold_400),
        "mindR7500": float(args.sig_threshold_7500),
        "use_bandpass": args.use_bandpass,
    }
    compat = "fixed" if args.fixed_settings else "strict"
    manifest = reprocess_corpus(paths, out_dir, settings=settings, compat=compat,
                                batch_size=args.batch_size,
                                resume=not args.no_resume,
                                wire=args.wire, diagnostics=args.diagnostics)
    done = sum(1 for v in manifest["files"].values() if v["status"] == "done")
    if not args.quiet:
        print(f"[+] {done}/{len(paths)} drops decoded -> {out_dir}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.corpus:
        return _run_corpus(args)

    if args.input == "ERROR_NO_FILE_SPECIFIED":
        print("[!] Error- no input WAV file specified! Terminating")
        return 1
    if not os.path.exists(args.input):
        print("[!] Specified input file does not exist! Terminating")
        return 1

    timerange = [parse_time_string(args.starttime), parse_time_string(args.endtime)]
    if timerange[1] <= 0:
        timerange[1] = -1
    triggerrange = [parse_time_string(args.autodetect_start),
                    parse_time_string(args.autodetect_end)]
    if triggerrange[1] <= 0:
        triggerrange[1] = -1

    settings = {
        "triggerrange": triggerrange,
        "minR400": float(args.sig_threshold_400),
        "mindR7500": float(args.sig_threshold_7500),
        "deadfreq": float(args.dead_freq),
        "pointsperloop": int(args.pointsperloop),
        "mark_space_freqs": [float(args.mark_freq), float(args.space_freq)],
        "use_bandpass": args.use_bandpass,
    }
    compat = "fixed" if args.fixed_settings else "strict"

    progress = None
    if not args.quiet:
        print("Processing profile")

        def progress(pct):
            print(f"[+] Processing status: {pct}%         ", end="\r")

    if args.engine == "tpu":
        from .models.tpu_engine import decode_wav_tpu

        result = decode_wav_tpu(args.input, timerange, settings, compat=compat,
                                wire=args.wire)
    else:
        result = decode_wav(args.input, timerange, settings, compat=compat,
                            progress=progress)

    if not args.quiet:
        print("\nProfile processing complete- writing output files")
    cfg = resolve_settings(settings, compat=compat)
    write_report(args.output, result, args.input, timerange, settings, cfg,
                 diagnostics=args.diagnostics)
    return 0


if __name__ == "__main__":
    sys.exit(main())
