"""Gnuplot bundle generation from experiment results.

The reference post-processes its aggregated result CSVs into gnuplot
data files + scripts (containers/analytics/scripts/gnuplot_generator.py,
plot_library.py, gnuplot/*.gnu): a replication-factor/edge-cut bar chart
per algorithm, a load-imbalance percentile chart, a communication /
locality chart, and an execution-time line chart. This module generates
the same four plot kinds from THIS engine's result records — the sweep
rows from ``cli experiment`` and the concurrent-harness levels from
``serving.concurrent_query_bench`` — as plain text (one ``.dat`` + one
``.gnu`` per plot, the ``.gnu`` referencing the ``.dat`` by name), so the
bundle renders with any stock gnuplot; nothing here needs gnuplot, a
plotting library, or Ray to run.

Not a port: the reference materializes pandas frames against fixed
template scripts; here both the data block and the script are generated
from the records themselves (algorithms and ks discovered, not
hard-coded).
"""

from __future__ import annotations

import os

# every script declares the missing-cell sentinel dat_block emits ('?'):
# without it stock gnuplot treats '?' as BAD data (warnings, broken
# lines) instead of a cleanly skipped point
_TERMINAL = ('set terminal pngcairo size 960,600\n'
             'set datafile missing "?"\n')


def dat_block(rows: list[dict], columns: list[str],
              header: bool = True) -> str:
    """Whitespace-separated gnuplot data block for ``columns`` of
    ``rows`` (column order preserved; first line a commented header)."""
    out = []
    if header:
        out.append("# " + "\t".join(columns))
    for r in rows:
        # a JSON null must become the missing sentinel, not literal "None"
        out.append("\t".join(
            "?" if r.get(c) is None else str(r[c]) for c in columns))
    return "\n".join(out) + "\n"


def _algorithms(records: list[dict]) -> list[str]:
    seen: list[str] = []
    for r in records:
        if r["algorithm"] not in seen:
            seen.append(r["algorithm"])
    return seen


def _ks(records: list[dict]) -> list[int]:
    return sorted({int(r["k"]) for r in records})


def _wide_by_k(records: list[dict], value_key: str):
    """One row per k, one column per algorithm (clustered-histogram /
    line-per-algorithm shape). Missing cells render as gnuplot '?'."""
    algs = _algorithms(records)
    cell = {(r["algorithm"], int(r["k"])): r for r in records}
    rows = []
    for k in _ks(records):
        row = {"k": k}
        for a in algs:
            r = cell.get((a, k))
            row[a] = r[value_key] if r is not None and value_key in r \
                else "?"
        rows.append(row)
    return rows, algs


def edge_cut_plot(records: list[dict], name: str = "edge-cut"
                  ) -> tuple[str, str]:
    """Clustered histogram: edge-cut ratio per algorithm at each k (the
    reference's replication-factor bar chart, rf.gnu, for the edge-cut
    family). Returns (dat text, gnu text)."""
    rows, algs = _wide_by_k(records, "edge_cut_ratio")
    dat = dat_block(rows, ["k"] + algs)
    plot = ", ".join(
        f"'{name}.dat' using {i + 2}:xtic(1) title '{a}'"
        for i, a in enumerate(algs))
    gnu = (_TERMINAL
           + f"set output '{name}.png'\n"
           "set style data histograms\n"
           "set style histogram clustered gap 1\n"
           "set style fill solid border -1\n"
           "set xlabel 'partitions (k)'\n"
           "set ylabel 'edge-cut ratio'\n"
           "set yrange [0:1]\n"
           "set key top left\n"
           f"plot {plot}\n")
    return dat, gnu


def crossing_plot(records: list[dict], name: str = "two-hop-crossing"
                  ) -> tuple[str, str]:
    """Two-hop partition-crossing fraction per algorithm/k — the
    locality-vs-communication chart (rf-comm.gnu analogue: fewer
    crossings = less inter-machine traffic per traversal)."""
    rows, algs = _wide_by_k(records, "crossing_fraction")
    dat = dat_block(rows, ["k"] + algs)
    plot = ", ".join(
        f"'{name}.dat' using {i + 2}:xtic(1) title '{a}'"
        for i, a in enumerate(algs))
    gnu = (_TERMINAL
           + f"set output '{name}.png'\n"
           "set style data histograms\n"
           "set style histogram clustered gap 1\n"
           "set style fill solid border -1\n"
           "set xlabel 'partitions (k)'\n"
           "set ylabel '2-hop crossing fraction'\n"
           "set yrange [0:1]\n"
           "set key top left\n"
           f"plot {plot}\n")
    return dat, gnu


def workload_time_plot(records: list[dict], workload: str,
                       name: str | None = None) -> tuple[str, str]:
    """Execution-time line chart for one workload: wall seconds vs k,
    one line per algorithm (time-line.gnu analogue; the reference plots
    time vs worker count per algorithm)."""
    name = name or f"time-{workload}"
    flat = []
    for r in records:
        wl = r.get("workloads", {}).get(workload)
        if wl is not None:
            flat.append({"algorithm": r["algorithm"], "k": int(r["k"]),
                         "wall_sec": wl["wall_sec"]})
    rows, algs = _wide_by_k(flat, "wall_sec")
    dat = dat_block(rows, ["k"] + algs)
    plot = ", ".join(
        f"'{name}.dat' using 1:{i + 2} with linespoints title '{a}'"
        for i, a in enumerate(algs))
    gnu = (_TERMINAL
           + f"set output '{name}.png'\n"
           "set xlabel 'partitions (k)'\n"
           f"set ylabel '{workload} wall time (s)'\n"
           "set key top left\n"
           f"plot {plot}\n")
    return dat, gnu


def load_percentile_plot(levels: list[dict],
                         name: str = "load-percentiles"
                         ) -> tuple[str, str]:
    """Per-shard request-load percentile chart from the concurrent
    harness (li-percentile.gnu analogue; the reference reports per-node
    load at percentiles 0/25/50/75/100, ldbc_run.py:129-133). One line
    per (algorithm, client level)."""
    pcts = [0, 25, 50, 75, 100]
    series = []
    for lv in levels:
        label = f"{lv['algorithm']}-{lv['n_clients']}c"
        series.append((label, lv["request_percentiles"]))
    rows = []
    for i, p in enumerate(pcts):
        row = {"pct": p}
        for label, vals in series:
            row[label] = vals[i]
        rows.append(row)
    labels = [label for label, _ in series]
    dat = dat_block(rows, ["pct"] + labels)
    plot = ", ".join(
        f"'{name}.dat' using 1:{i + 2} with linespoints title '{lb}'"
        for i, lb in enumerate(labels))
    gnu = (_TERMINAL
           + f"set output '{name}.png'\n"
           "set xlabel 'percentile'\n"
           "set ylabel 'requests served per shard'\n"
           "set key top left\n"
           f"plot {plot}\n")
    return dat, gnu


def write_plot_bundle(outdir: str, name: str, dat: str, gnu: str
                      ) -> dict[str, str]:
    """Write ``name.dat`` + ``name.gnu`` under ``outdir``; returns the
    two paths. The script references the data file by RELATIVE name, so
    the bundle renders from its own directory with ``gnuplot name.gnu``."""
    os.makedirs(outdir, exist_ok=True)
    dat_path = os.path.join(outdir, f"{name}.dat")
    gnu_path = os.path.join(outdir, f"{name}.gnu")
    with open(dat_path, "w") as f:
        f.write(dat)
    with open(gnu_path, "w") as f:
        f.write(gnu)
    return {"dat": dat_path, "gnu": gnu_path}


def qps_plot(levels: list[dict], name: str = "qps"
             ) -> tuple[str, str]:
    """Clustered throughput histogram: qps per client level, one cluster
    per algorithm (tput-bar.gnu analogue — the reference plots queries/s
    per configuration as clustered bars)."""
    algs: list[str] = []
    for lv in levels:
        if lv["algorithm"] not in algs:
            algs.append(lv["algorithm"])
    n_clients = sorted({int(lv["n_clients"]) for lv in levels})
    cell = {(lv["algorithm"], int(lv["n_clients"])): lv for lv in levels}
    rows = []
    for a in algs:
        row: dict = {"algorithm": a}
        for nc in n_clients:
            lv = cell.get((a, nc))
            row[f"{nc}c"] = lv["qps"] if lv is not None else None
        rows.append(row)
    cols = [f"{nc}c" for nc in n_clients]
    dat = dat_block(rows, ["algorithm"] + cols)
    plot = ", ".join(
        f"'{name}.dat' using {i + 2}:xtic(1) title '{c}'"
        for i, c in enumerate(cols))
    gnu = (_TERMINAL
           + f"set output '{name}.png'\n"
           "set style data histograms\n"
           "set style histogram clustered gap 1\n"
           "set style fill solid border -1\n"
           "set boxwidth 0.9\n"
           "set grid ytics\n"
           "set ylabel 'throughput (queries / second)'\n"
           "set yrange [0:*]\n"
           "set key top left\n"
           f"plot {plot}\n")
    return dat, gnu


def concurrent_plot_bundle(levels: list[dict], outdir: str) -> list[str]:
    """Plot bundle for ``bench.py --concurrent`` output (the ``levels``
    list from ``serving.concurrent_query_bench``): the qps clustered
    histogram (tput-bar.gnu analogue) + the per-shard load percentile
    chart (li-percentile.gnu analogue)."""
    if not levels:
        raise ValueError("no concurrent-bench levels to plot")
    written = []
    for name, (dat, gnu) in [("qps", qps_plot(levels, "qps")),
                             ("load-percentiles",
                              load_percentile_plot(levels))]:
        p = write_plot_bundle(outdir, name, dat, gnu)
        written.extend([p["dat"], p["gnu"]])
    return written


def experiment_plot_bundle(records: list[dict], outdir: str) -> list[str]:
    """The gnuplot_generator.py analogue: every applicable plot kind from
    one ``cli experiment`` result list. Returns the written paths."""
    if not records:
        # an empty list would render scripts with a bare `plot ` line —
        # invalid gnuplot; fail loudly instead of writing a broken bundle
        raise ValueError("no experiment records to plot")
    written = []
    pairs = [edge_cut_plot(records, "edge-cut")]
    names = ["edge-cut"]
    if any("crossing_fraction" in r for r in records):
        pairs.append(crossing_plot(records, "two-hop-crossing"))
        names.append("two-hop-crossing")
    workloads = sorted({w for r in records
                        for w in r.get("workloads", {})})
    for wl in workloads:
        pairs.append(workload_time_plot(records, wl))
        names.append(f"time-{wl}")
    for name, (dat, gnu) in zip(names, pairs):
        p = write_plot_bundle(outdir, name, dat, gnu)
        written.extend([p["dat"], p["gnu"]])
    return written
