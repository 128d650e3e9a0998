"""Pins the driver-facing bench output contract.

Round 6 lost its entire perf receipt because the single stdout JSON
line grew to ~8 KB while the driver captures only the last 2,000 bytes
of stdout ("parsed": null in BENCH_r06.json). These tests guarantee
that can never recur: the compact line must stay under 1,900 bytes at
full payload size, parse as one JSON object with the driver's expected
keys, and the full grid detail must land in the grid receipt instead.

Every test redirects the receipt via SPARK_GRAFT_GRID_PATH to a tmp
file — running pytest must never overwrite or delete the round's REAL
BENCH_GRID.json at the repo root (that would be the same data-loss
mode these tests exist to prevent).

No SparkSession needed — bench.emit() is pure apart from the receipt
file write.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


@pytest.fixture(autouse=True)
def _redirect_receipt(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_GRID_PATH", str(tmp_path / "BENCH_GRID.json"))
    yield


def _full_size_payload():
    # 60 keys (50 headline + 10 grid-comparable) with padded names —
    # strictly larger than the real key set so the budget test is
    # conservative.
    queries = {f"padded_query_key_name_{i:02d}": 123.456 for i in range(60)}
    grid_stats = {
        f"knn_config_label_{i}": {
            fmt: {
                "ms_per_search": 1234.56,
                "ms_median": 1200.12,
                "qps": 99.9,
                "iters": 10,
            }
            for fmt in ("fp32", "fp32_f64", "fp16c", "bf16c")
        }
        for i in range(8)
    }
    gain = {
        "knn_medium_768d": {"fp16c": 10.0, "bf16c": 8.6},
        "knn_large_1536d": {"fp16c": 0.2, "bf16c": 0.5},
        "knn_xlarge_768d": {"fp16c": 52.5, "bf16c": 12.5},
    }
    return queries, grid_stats, gain


def test_line_fits_driver_capture():
    queries, grid_stats, gain = _full_size_payload()
    line = bench.emit(queries, grid_stats, gain, 0.1)
    assert len(line) < 1900
    assert "\n" not in line


def test_oversized_payload_degrades_not_crashes():
    # 300 verbose keys — far past any real key set. emit must still
    # return a parseable <1,900-byte line (folding the cheapest keys
    # into "_other"), never crash or overflow: a crashed bench is a
    # lost round just like a truncated one.
    queries = {
        f"absurdly_verbose_benchmark_query_key_{i:03d}": float(i) for i in range(300)
    }
    line = bench.emit(queries, {}, {}, 0.1)
    assert len(line) < 1900
    d = json.loads(line)
    assert abs(d["value"] - round(sum(queries.values()), 3)) < 1e-6
    # slowest keys survive by name; the rest are folded
    assert "absurdly_verbose_benchmark_query_key_299" in d["queries"]
    assert "_other" in d["queries"]
    total_in_line = sum(d["queries"].values())
    assert abs(total_in_line - sum(queries.values())) < 0.1 * len(queries)


def test_line_parses_with_driver_keys():
    # realistic key lengths (longest real key is 21 chars:
    # "knn_medium_768d_fp16c") — all keys must survive by name
    queries = {f"real_size_key_{i:02d}": 123.456 for i in range(60)}
    d = json.loads(bench.emit(queries, _full_size_payload()[1], {}, 0.1))
    assert d["metric"] == "headline_total_sec"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    assert set(d["queries"]) == set(queries)
    # per-key values survive rounding to 2dp
    assert abs(d["queries"]["real_size_key_00"] - 123.46) < 1e-9
    assert abs(d["value"] - round(sum(queries.values()), 3)) < 1e-6


def test_receipt_file_carries_full_grid(tmp_path):
    queries, grid_stats, gain = _full_size_payload()
    isolation = {
        "loadavg_start": [1.2, 1.1, 1.0],
        "loadavg_end": [2.0, 1.5, 1.2],
        "cpus": 32,
        "wall_sec": 99.5,
        "headline_runs_sec": {
            k: {"times": [v, v * 1.05, v * 1.02], "load1m": [0.4, 0.5, 0.4]}
            for k, v in queries.items()
        },
    }
    line = bench.emit(queries, grid_stats, gain, 0.1, isolation)
    with open(tmp_path / "BENCH_GRID.json") as f:
        receipt = json.load(f)
    assert receipt["grid"] == grid_stats
    assert receipt["storage_gain_pct_vs_fp32_same_arith"] == gain
    assert receipt["queries_sec"] == queries  # unrounded in the receipt
    assert "headline" in receipt["method"] and "grid" in receipt["method"]
    # isolation metadata: per-key spread + host-load snapshot land in
    # the receipt (a contaminated run must be self-evident), and the
    # stdout line still fits the driver capture with it present
    iso = receipt["isolation"]
    assert iso["loadavg_start"] == [1.2, 1.1, 1.0]
    assert iso["cpus"] == 32
    assert set(iso["headline_runs_sec"]) == set(queries)
    # r11 shape: all three timed runs + a load sample BEFORE EACH timed
    # run (r10 sampled once pre-warmup, so a spike arriving during the
    # timed block could hide), so noise vs regression is separable per
    # key per run
    assert all(
        len(v["times"]) == 3 and len(v["load1m"]) == 3
        for v in iso["headline_runs_sec"].values()
    )
    assert len(line) < 1900
    # emit without isolation still writes a receipt (empty dict)
    bench.emit(queries, grid_stats, gain, 0.1)
    with open(tmp_path / "BENCH_GRID.json") as f:
        assert json.load(f)["isolation"] == {}


def test_tests_never_touch_real_receipt():
    """The repo-root receipt must be untouched by any emit() under
    pytest: the autouse fixture redirects it. Pin by writing a marker
    file at the real path and checking emit leaves it alone."""
    real = os.path.join(os.path.dirname(bench.__file__), "BENCH_GRID.json")
    existed = os.path.exists(real)
    before = open(real).read() if existed else None
    bench.emit({"k": 1.0}, {}, {}, 0.1)
    if existed:
        assert open(real).read() == before
    else:
        assert not os.path.exists(real)
