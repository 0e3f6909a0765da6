"""Harness for executing the upstream reference implementation in-process.

The reference (read-only at /root/reference) pins numpy 1.22 and gsw
3.3.1, neither of which exists in this environment, so we shim:

* ``np.float`` / ``np.NaN`` (removed in numpy 2.0) — restored as aliases;
* ``gsw.SP_from_C`` — replaced with our PSS-78 implementation
  (axctdprocessor_tpu.ops.seawater.sp_from_c_np), which is independently
  validated against the published UNESCO check values.  The parity engine
  uses the same function, so golden comparisons are exact.

The reference reads ``temp_LUT.txt`` relative to the CWD
(reference parse.py:139, AXCTDprocessor.py:130), so runs chdir into the
reference directory.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def _install_shims() -> None:
    if not hasattr(np, "float"):
        np.float = float  # numpy 1.x alias used at reference AXCTDprocessor.py:57
    if not hasattr(np, "NaN"):
        np.NaN = np.nan
    if "gsw" not in sys.modules:
        from axctdprocessor_tpu.ops.seawater import sp_from_c_np

        gsw = types.ModuleType("gsw")
        gsw.SP_from_C = sp_from_c_np
        sys.modules["gsw"] = gsw


def load_reference_modules():
    """Import the reference modules (AXCTDprocessor, demodulate, parse, CLI)."""
    if not os.path.isdir(REFERENCE_DIR):
        import pytest

        pytest.skip("upstream reference not mounted at /root/reference")
    _install_shims()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import AXCTDprocessor  # noqa: F401
    import demodulate  # noqa: F401
    import parse  # noqa: F401
    import processAXCTD  # noqa: F401

    return types.SimpleNamespace(
        AXCTDprocessor=AXCTDprocessor,
        demodulate=demodulate,
        parse=parse,
        processAXCTD=processAXCTD,
    )


@contextlib.contextmanager
def _in_reference_dir():
    cwd = os.getcwd()
    os.chdir(REFERENCE_DIR)
    try:
        yield
    finally:
        os.chdir(cwd)


def run_reference_cli(wavfile: str, outfile: str, timerange=None, settings=None) -> None:
    """Run the reference end-to-end (processor + report writer) on a WAV.

    `settings` uses the reference CLI's dict keys (processAXCTD.py:93-99);
    defaults mirror the CLI defaults.
    """
    mods = load_reference_modules()
    if timerange is None:
        timerange = [0, -1]
    base = {
        "triggerrange": [30, -1],
        "minR400": 2.0,
        "mindR7500": 1.5,
        "deadfreq": 3000.0,
        "pointsperloop": 100000,
        "mark_space_freqs": [400.0, 800.0],
        "use_bandpass": False,
    }
    if settings:
        base.update(settings)
    with _in_reference_dir(), contextlib.redirect_stdout(io.StringIO()):
        mods.processAXCTD.processAXCTD(
            os.path.abspath(wavfile), os.path.abspath(outfile), timerange, base
        )


def run_reference_processor(wavfile: str, timerange=None, settings=None):
    """Run just the reference AXCTD_Processor, returning the instance."""
    mods = load_reference_modules()
    if timerange is None:
        timerange = [0, -1]
    with _in_reference_dir(), contextlib.redirect_stdout(io.StringIO()):
        ap = mods.AXCTDprocessor.AXCTD_Processor(
            os.path.abspath(wavfile), timerange=timerange, user_settings=settings or {}
        )
        ap.run()
    return ap
