#!/usr/bin/env python3
"""CPU-mesh cross-check for the 64-drop batch failure: decode the known-
bad rows with each wire on the CPU backend.  If the same rows fail with
wire='int4' on CPU, the failure is the noise-shaped int4 encoding at
this SNR (content-dependent), not the relay/TPU — and int8 should fix
them.  Run with: env -u PYTHONPATH JAX_PLATFORMS=cpu PYTHONPATH=/root/repo
"""

import sys

import numpy as np

from axctdprocessor_tpu.models import simulator
from axctdprocessor_tpu.parallel import batch as pbatch

BATCH_SECONDS = 60.0


def build_rows(n=64):
    rng = np.random.default_rng(7)
    spec = simulator.SimSpec(duration=BATCH_SECONDS, profile_start=40.0,
                             seed=21)
    pcm, truth = simulator.synthesize(spec)
    scale = 28000 / np.max(np.abs(pcm))
    base = np.round(pcm * scale).astype(np.int16)
    rows = np.stack([
        np.clip(base + rng.integers(-300, 300, len(base)), -32768, 32767)
        .astype(np.int16)
        for _ in range(n)
    ])
    return rows, truth


def main():
    import jax
    print("backend:", jax.default_backend())
    rows, truth = build_rows()
    # 2 known-bad rows + 2 known-good rows from the TPU run at int4-ns
    pick = [int(a) for a in sys.argv[1:]] or [2, 4, 0, 1]
    sub = rows[pick]
    for wire in ("int4", "int8"):
        res = pbatch.decode_batch(sub, 44100, lengths=[rows.shape[1]] * len(pick),
                                  wire=wire)
        for j, r in enumerate(res):
            ok = (r.status == 2
                  and r.metadata.get("serial_no") == truth["serial_no"])
            print(f"wire={wire} row {pick[j]:2d}: ok={ok} status={r.status} "
                  f"serial={r.metadata.get('serial_no')!r} "
                  f"frames={len(r.hexframes)}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
