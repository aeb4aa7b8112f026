"""Gnuplot bundle generation (the reference's gnuplot_generator.py /
plot_library.py analogue): data blocks align with scripts, every plot
kind discovers its algorithms/ks from the records, and the CLI writes a
renderable bundle. Pure text — no Ray session involved."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECORDS = [
    {"algorithm": "hash", "k": 4, "edge_cut_ratio": 0.75,
     "imbalance": 1.02, "crossing_fraction": 0.61,
     "workloads": {"pagerank": {"wall_sec": 1.5, "n_rows": 100},
                   "sssp": {"wall_sec": 0.8, "n_rows": 90}}},
    {"algorithm": "fennel", "k": 4, "edge_cut_ratio": 0.08,
     "imbalance": 1.04, "crossing_fraction": 0.12,
     "workloads": {"pagerank": {"wall_sec": 1.4, "n_rows": 100},
                   "sssp": {"wall_sec": 0.7, "n_rows": 90}}},
    {"algorithm": "hash", "k": 16, "edge_cut_ratio": 0.94,
     "imbalance": 1.03, "crossing_fraction": 0.8,
     "workloads": {"pagerank": {"wall_sec": 1.6, "n_rows": 100},
                   "sssp": {"wall_sec": 0.9, "n_rows": 90}}},
    {"algorithm": "fennel", "k": 16, "edge_cut_ratio": 0.26,
     "imbalance": 1.05, "crossing_fraction": 0.2,
     "workloads": {"pagerank": {"wall_sec": 1.5, "n_rows": 100}}},
]


def test_edge_cut_plot_aligns_data_and_script():
    from sgp_sketch.plots import edge_cut_plot

    dat, gnu = edge_cut_plot(RECORDS, "edge-cut")
    lines = [ln for ln in dat.splitlines() if not ln.startswith("#")]
    assert len(lines) == 2  # one row per k
    k4 = lines[0].split("\t")
    assert k4 == ["4", "0.75", "0.08"]  # k, hash, fennel (record order)
    assert "'edge-cut.dat' using 2:xtic(1) title 'hash'" in gnu
    assert "using 3:xtic(1) title 'fennel'" in gnu
    assert "set output 'edge-cut.png'" in gnu


def test_workload_time_plot_skips_missing_cells():
    from sgp_sketch.plots import workload_time_plot

    dat, gnu = workload_time_plot(RECORDS, "sssp")
    lines = [ln for ln in dat.splitlines() if not ln.startswith("#")]
    # fennel has no sssp cell at k=16 -> gnuplot missing-value '?'
    assert lines[1].split("\t") == ["16", "0.9", "?"]
    assert "with linespoints title 'hash'" in gnu


def test_load_percentile_plot_shape():
    from sgp_sketch.plots import load_percentile_plot

    levels = [
        {"algorithm": "hash", "n_clients": 12,
         "request_percentiles": [10, 20, 30, 40, 50]},
        {"algorithm": "fennel", "n_clients": 12,
         "request_percentiles": [20, 25, 30, 35, 40]},
    ]
    dat, gnu = load_percentile_plot(levels)
    lines = [ln for ln in dat.splitlines() if not ln.startswith("#")]
    assert len(lines) == 5  # percentiles 0/25/50/75/100
    assert lines[0].split("\t") == ["0", "10", "20"]
    assert "title 'hash-12c'" in gnu and "title 'fennel-12c'" in gnu


def test_cli_plots_writes_bundle(tmp_path):
    results = tmp_path / "exp.json"
    results.write_text(json.dumps(RECORDS))
    outdir = tmp_path / "plots"
    proc = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "plots",
         str(results), str(outdir)],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-800:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    names = sorted(os.path.basename(p) for p in out["written"])
    assert "edge-cut.dat" in names and "edge-cut.gnu" in names
    assert "two-hop-crossing.gnu" in names
    assert "time-pagerank.gnu" in names and "time-sssp.gnu" in names
    # every script references its own dat file by relative name
    for p in out["written"]:
        if p.endswith(".gnu"):
            base = os.path.basename(p)[:-4]
            assert f"'{base}.dat'" in open(p).read()

LEVELS = [
    {"algorithm": "hash", "n_clients": 12, "qps": 510.0,
     "request_percentiles": [10, 20, 30, 40, 50]},
    {"algorithm": "hash", "n_clients": 24, "qps": 540.0,
     "request_percentiles": [12, 22, 32, 42, 52]},
    {"algorithm": "fennel", "n_clients": 12, "qps": 505.0,
     "request_percentiles": [20, 25, 30, 35, 40]},
    {"algorithm": "fennel", "n_clients": 24, "qps": 538.0,
     "request_percentiles": [22, 27, 32, 37, 42]},
]


def test_qps_plot_pivots_level_per_column():
    from sgp_sketch.plots import qps_plot

    dat, gnu = qps_plot(LEVELS, "qps")
    lines = [ln for ln in dat.splitlines() if not ln.startswith("#")]
    assert len(lines) == 2  # one cluster per algorithm
    assert lines[0].split("\t") == ["hash", "510.0", "540.0"]
    assert lines[1].split("\t") == ["fennel", "505.0", "538.0"]
    assert "'qps.dat' using 2:xtic(1) title '12c'" in gnu
    assert "using 3:xtic(1) title '24c'" in gnu
    # a missing (algorithm, level) cell renders as the '?' sentinel
    dat3, _ = qps_plot(LEVELS[:3], "qps")
    rows = [ln for ln in dat3.splitlines() if not ln.startswith("#")]
    assert rows[1].split("\t") == ["fennel", "505.0", "?"]


def test_cli_plots_dispatches_concurrent_dict(tmp_path):
    results = tmp_path / "conc.json"
    results.write_text(json.dumps(
        {"metric": "concurrent_query_qps", "levels": LEVELS}))
    outdir = tmp_path / "plots"
    proc = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "plots",
         str(results), str(outdir)],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-800:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    names = sorted(os.path.basename(p) for p in out["written"])
    assert names == ["load-percentiles.dat", "load-percentiles.gnu",
                     "qps.dat", "qps.gnu"]
    # dict input without 'levels' fails loudly, not with a stack trace
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"metric": "x"}))
    proc2 = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "plots",
         str(bad), str(outdir)],
        capture_output=True, text=True, cwd=REPO)
    assert proc2.returncode == 2
    assert "levels" in proc2.stdout


def test_empty_inputs_fail_loudly(tmp_path):
    import pytest

    from sgp_sketch.plots import concurrent_plot_bundle, \
        experiment_plot_bundle

    with pytest.raises(ValueError):
        experiment_plot_bundle([], str(tmp_path))
    with pytest.raises(ValueError):
        concurrent_plot_bundle([], str(tmp_path))
    assert list(tmp_path.iterdir()) == []  # no broken bundle written

    results = tmp_path / "empty.json"
    results.write_text("[]")
    proc = subprocess.run(
        [sys.executable, "-m", "sgp_sketch.cli", "plots",
         str(results), str(tmp_path / "plots")],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 2
    assert "no experiment records" in proc.stdout
