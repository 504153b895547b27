"""The driver contract on bench.py's FINAL stdout line.

The round-4 record was lost to a single giant JSON line truncated past the
driver's ~2000-char tail window (VERDICT r4 missing item 1).  These tests
pin the fix: `_headline` stays far below the window in both the success
and the worst-case error branch, and carries the fields the record
contract names.  bench.py deliberately imports no jax at module level
(workload metadata is read by the parent process), so this test is pure
host-side.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

TAIL_WINDOW = 2000
MARGIN = 500  # room for driver-side prefixes/wrapping


def _full_record(flag):
    return {
        "metric": "1dtfim_n100_vmc_samples_per_sec",
        "value": 209752.2,
        "unit": "samples/s",
        "vs_baseline": 419.5,
        "mfu": 0.0939,
        "stale_last_good_onchip": {
            "source": "BENCH_r04.json",
            "value": 206469.0,
            "vs_baseline": 412.9,
            "extra": "x" * 500,  # must NOT leak into the headline
        },
    }


def test_headline_success_branch_fits_tail_window():
    flag = {"steps_per_sec": 419.5, "samples_per_sec": 209752.2,
            "mfu": 0.0939, "roof_frac": 0.2405}
    accuracy = {"steps_to_rtol": 100, "rel_error": 6.3e-4, "converged": True}
    h = bench._headline(_full_record(flag), flag, accuracy, 0, 24)
    line = json.dumps(h)
    assert len(line) < TAIL_WINDOW - MARGIN, len(line)
    got = json.loads(line)
    for field in ("metric", "value", "vs_baseline", "mfu", "row_timeouts",
                  "rows_measured", "accuracy_n20_minsr"):
        assert field in got, field
    assert got["value"] == 209752.2
    assert "workloads" not in got  # the giant dict must stay off this line


def test_headline_error_branch_caps_length():
    # worst case: flagship lost with a huge subprocess-tail error string,
    # accuracy probe failed with its own (already-capped) error
    flag = {"error": "timeout: " + "y" * 5000}
    accuracy = {"ok": False, "error": "z" * 200}
    h = bench._headline(_full_record(flag), flag, accuracy, 3, 20)
    line = json.dumps(h)
    assert len(line) < TAIL_WINDOW - MARGIN, len(line)
    got = json.loads(line)
    assert len(got["error"]) <= 200
    # the stale fallback carries only the three named fields
    assert set(got["stale_last_good_onchip"]) <= {
        "source", "value", "vs_baseline"}
