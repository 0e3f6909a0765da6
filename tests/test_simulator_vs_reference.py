"""End-to-end validation of the synthetic signal generator.

The reference implementation itself (run in-process via ref_harness) must
fully decode a simulated drop: detect the pulse, read the headers,
recover serial/probe/coefficients, trigger on the 7500 Hz tone, and parse
profile frames whose hex matches the encoder's truth.  This proves the
simulator is a faithful inverse of the decode pipeline and anchors all
golden-parity tests.
"""

import numpy as np
import pytest

from ref_harness import run_reference_processor


@pytest.fixture(scope="module")
def decoded(default_drop_wav):
    path, truth = default_drop_wav
    ap = run_reference_processor(path)
    return ap, truth


def test_pulse_and_trigger_detection(decoded):
    ap, truth = decoded
    spec = truth["spec"]
    fs = ap.f_s
    assert ap.status == 2
    assert abs(ap.firstpulse400 / fs - spec.pulse_start) < 0.3
    assert abs(ap.profstartind / fs - spec.profile_start) < 0.5


def test_header_metadata(decoded):
    ap, truth = decoded
    assert ap.metadata["serial_no"] == truth["serial_no"]
    assert ap.metadata["probe_code"] == truth["probe_code"]
    assert ap.metadata["max_depth"] == truth["max_depth"]
    for name in ("zcoeff", "tcoeff", "ccoeff"):
        assert all(ap.metadata[f"{name}_valid"]), name
        np.testing.assert_allclose(ap.metadata[name], truth[name], rtol=0, atol=0)


def test_profile_frames_match_truth(decoded):
    ap, truth = decoded
    assert len(ap.hexframes) > 200
    truth_set = set(truth["frame_hex"])
    matched = sum(1 for hf in ap.hexframes if hf in truth_set)
    assert matched / len(ap.hexframes) > 0.98


def test_profile_values_sane(decoded):
    ap, _ = decoded
    temps = np.asarray(ap.temperature)
    psals = np.asarray(ap.salinity)
    depths = np.asarray(ap.depth)
    assert np.all((temps > -10) & (temps < 50))
    assert np.all((psals > -1) & (psals < 100))
    assert np.all(np.diff(np.asarray(ap.time)) > 0)
    assert depths[-1] > depths[0]
