"""CLI entry point: ``python -m sgp_sketch.cli <command>``.

The single entry point that replaces the reference's three harnesses
(partitioner JVM main, analytics shell, interactive master —
SURVEY.md §3.3): build sketches over a tokens table, optionally
checkpointed/resumable, and emit estimates + metrics JSON.

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# the CLI's machine-readable output stream; main() rebinds it to the real
# stdout fd and reroutes fd 1 to stderr so Ray log chatter can't pollute it
_OUT = sys.stdout


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # raylet chatter (e.g. worker-count warnings from num_cpus=0
            # actor pools) must not contaminate the CLI's JSON stdout
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .pipeline import build_sketches
    from .schema import tokens_dataset

    if os.path.isdir(args.input) and os.path.exists(
        os.path.join(args.input, "documents.parquet")
    ):
        ds = tokens_dataset(args.input)
    else:
        ds = rd.read_parquet(args.input)

    if getattr(args, "append", False) and not args.checkpoint_dir:
        # silently running a fresh build over ONLY the new shard would
        # look like a successful increment fold
        print("--append requires --checkpoint-dir (the base build to "
              "fold the increment into)", file=sys.stderr)
        return 2
    if args.checkpoint_dir and getattr(args, "append", False):
        from .checkpoint import append_increment

        res = append_increment(ds, args.checkpoint_dir,
                               batch_size=args.batch_size,
                               input_files=[args.input])
    elif args.checkpoint_dir:
        from .checkpoint import run_checkpointed

        res = run_checkpointed(ds, args.checkpoint_dir, k=args.k,
                               batch_size=args.batch_size)
    else:
        res = build_sketches(ds, k=args.k, batch_size=args.batch_size,
                             plan=not args.no_plan)

    table = res.estimates_table().to_pandas()
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        table.to_json(args.output, orient="records", lines=True)
    else:
        print(table.to_string(index=False), file=_OUT)
    if args.metrics:
        from .metrics import write_metrics

        write_metrics(args.metrics, res.metrics)
    else:
        print(json.dumps(res.metrics, default=str), file=sys.stderr)
    return 0


def cmd_partition(args) -> int:
    """Plan-only: greedy source -> partition assignment + imbalance report
    (the analogue of the reference's vertex,partition output CSV)."""
    _init_ray(args.num_cpus)
    from .metrics import imbalance_report
    from .pipeline import plan_partitions
    from .schema import tokens_dataset

    ds = tokens_dataset(args.input).select_columns(["source", "n_tok"])
    amap, sizes, agg = plan_partitions(ds, args.k)
    rows = [
        {"source": s, "partitions": [int(x) for x in p]} for s, p in sorted(amap.items())
    ]
    out = {"k": args.k, "assignment": rows, "report": imbalance_report(sizes)}
    print(json.dumps(out, indent=1), file=_OUT)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sgp_sketch")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the sketch pipeline")
    b.add_argument("input", help="tokens parquet path/glob, or a testdata sf dir")
    b.add_argument("-k", type=int, default=16)
    b.add_argument("--batch-size", type=int, default=8192)
    b.add_argument("--checkpoint-dir", default=None)
    b.add_argument("--no-plan", action="store_true",
                   help="hash partitioning instead of the greedy plan")
    b.add_argument("--append", action="store_true",
                   help="fold this input into an EXISTING checkpoint dir "
                        "(incremental sketch maintenance)")
    b.add_argument("--output", default=None, help="estimates JSONL path")
    b.add_argument("--metrics", default=None, help="metrics JSON path")
    b.set_defaults(fn=cmd_build)

    pp = sub.add_parser("partition", help="greedy partition plan only")
    pp.add_argument("input", help="testdata sf dir")
    pp.add_argument("-k", type=int, default=16)
    pp.set_defaults(fn=cmd_partition)

    ex = sub.add_parser("experiment",
                        help="config-driven algorithm x k cross-product")
    ex.add_argument("config", help="JSON config path")
    ex.set_defaults(fn=cmd_experiment)

    cu = sub.add_parser("curate", help="materialize the curated corpus")
    cu.add_argument("input", help="testdata sf dir")
    cu.add_argument("output", help="output dir (hive-partitioned parquet)")
    cu.add_argument("--min-quality-e6", type=int, default=None,
                    help="default: queries._CURATION_Q6 (the oracle-"
                         "gated corpus_curation threshold)")
    cu.set_defaults(fn=cmd_curate)

    mx = sub.add_parser("mix", help="materialize a data-mixing recipe "
                                    "(quota -> repeat -> epoch shuffle)")
    mx.add_argument("input", help="documents parquet path, sf dir, or "
                                  ".jsonl[.gz]")
    mx.add_argument("output", help="output dir")
    mx.add_argument("config", help="JSON recipe: quotas/weight_col/"
                                   "repeats/epoch/seed/shuffle/format")
    mx.set_defaults(fn=cmd_mix)

    pl = sub.add_parser("plots",
                        help="gnuplot bundle from experiment results "
                             "(gnuplot_generator.py analogue)")
    pl.add_argument("results",
                    help="JSON written by `experiment` (record list) or "
                         "`bench.py --concurrent` (dict with 'levels')")
    pl.add_argument("outdir", help="directory for the .dat/.gnu bundle")
    pl.set_defaults(fn=cmd_plots)

    args = p.parse_args(argv)
    # stdout is a JSON contract. Ray's log monitor forwards some raylet
    # warnings to fd 1 even with log_to_driver=False (e.g. the
    # worker-process-count warning triggered by num_cpus=0 actor pools),
    # so route EVERY fd-1 write to stderr for the duration of the run and
    # emit the command's JSON on the saved real stdout at the end.
    import os as _os

    global _OUT
    saved = _os.fdopen(_os.dup(1), "w")
    _OUT = saved
    _os.dup2(2, 1)  # sys.stdout (and Ray's log monitor) now hit stderr
    try:
        rc = args.fn(args)
    finally:
        saved.flush()
        # shutdown must run on the ERROR path too: an in-process caller
        # (tests) would otherwise leak the Ray session and its CPU slots
        import ray

        if ray.is_initialized():
            ray.shutdown()
        # restore fd 1 and drop the dup so main() is re-entrant: a
        # second in-process call would otherwise dup STDERR as its
        # "real stdout" and leak one fd per call
        _os.dup2(saved.fileno(), 1)
        _OUT = sys.stdout
        saved.close()
    return rc




def cmd_plots(args) -> int:
    """Generate the gnuplot .dat/.gnu bundle from a result JSON: an
    ``experiment`` record list yields the edge-cut histogram, 2-hop
    crossing chart and per-workload time lines; a ``bench.py
    --concurrent`` dict (its ``levels`` list) yields the qps histogram
    and per-shard load percentile chart. Pure text generation — no Ray
    session, no plotting libraries; render with stock
    ``gnuplot <name>.gnu``."""
    from .plots import concurrent_plot_bundle, experiment_plot_bundle

    try:
        # inside the try: a missing or non-JSON results file is the
        # same class of bad input as an empty record list and must use
        # the same error contract (JSON on _OUT + exit 2), not a raw
        # traceback
        with open(args.results) as f:
            records = json.load(f)
        if isinstance(records, dict):
            if "levels" not in records:
                raise ValueError("dict input has no 'levels' key "
                                 "(expected bench.py --concurrent output)")
            written = concurrent_plot_bundle(records["levels"], args.outdir)
        else:
            written = experiment_plot_bundle(records, args.outdir)
    except (OSError, ValueError) as e:  # JSONDecodeError is a ValueError
        print(json.dumps({"error": str(e)}), file=_OUT)
        return 2
    print(json.dumps({"written": written}), file=_OUT)
    return 0


def cmd_curate(args) -> int:
    """Materialize the curated corpus (the end-to-end filter chain of the
    ``corpus_curation`` query) as HIVE-PARTITIONED parquet — one directory
    per source, so a failed run resumes by skipping finished partitions
    and downstream readers prune partitions at the path level."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .queries import (_CURATION_Q6, curation_filter_batch,
                          curation_keep_rows, dedup_clusters)

    clusters = dedup_clusters(args.input)
    # shared predicate with the oracle-gated corpus_curation query — the
    # CLI materializes exactly what the gate verifies
    min_q6 = args.min_quality_e6 if args.min_quality_e6 is not None \
        else _CURATION_Q6

    def _filt(b):
        return curation_filter_batch(b, min_q6=min_q6)

    ds = rd.read_parquet(f"{args.input}/documents.parquet")
    kept = curation_keep_rows(ds.map_batches(_filt, batch_format="pandas"),
                              clusters)
    kept.write_parquet(args.output, partition_cols=["source"])

    import pyarrow.dataset as pds

    n = pds.dataset(args.output, format="parquet",
                    partitioning="hive").count_rows()
    print(json.dumps({"written_rows": int(n), "output": args.output,
                      "min_quality_e6": min_q6}), file=_OUT)
    return 0


def cmd_mix(args) -> int:
    """Materialize a DATA-MIXING recipe over a documents corpus:
    per-source quota downsampling (document counts or token budgets) →
    fractional repeat upsampling (replica-epoch tagged) → a
    deterministic replayable epoch shuffle → parquet or JSONL output.
    Config JSON mirrors the experiment config discipline: unknown keys
    are rejected so a recipe can never silently no-op. When repeats are
    active the shuffle salts on the replica epoch, so upsampled copies
    spread through the epoch instead of riding adjacent."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .ops import epoch_shuffle, source_quota_sample, source_repeat
    from .sources import read_documents_jsonl, write_documents_jsonl

    with open(args.config) as f:
        cfg = json.load(f)
    allowed = {"quotas", "weight_col", "repeats", "epoch", "seed",
               "shuffle", "format"}
    unknown = set(cfg) - allowed
    if unknown:
        raise SystemExit(f"unknown mix config keys: {sorted(unknown)} "
                         f"(allowed: {sorted(allowed)})")
    shuffle = cfg.get("shuffle", "global")
    if shuffle not in ("global", "blocks", "none"):
        raise SystemExit("shuffle must be 'global', 'blocks' or 'none'")
    fmt = cfg.get("format", "parquet")
    if fmt not in ("parquet", "jsonl"):
        raise SystemExit("format must be 'parquet' or 'jsonl'")
    seed = int(cfg.get("seed", 0))

    inp = args.input
    if os.path.isdir(inp) and os.path.exists(
            os.path.join(inp, "documents.parquet")):
        inp = os.path.join(inp, "documents.parquet")
    # route on the SUFFIX, not a substring — a parquet path that merely
    # contains ".jsonl" (backup dirs, doubled extensions) is parquet
    ds = (read_documents_jsonl(inp)
          if inp.endswith((".jsonl", ".jsonl.gz"))
          else rd.read_parquet(inp))

    salt = None
    if cfg.get("quotas"):
        ds = source_quota_sample(ds, cfg["quotas"], seed=seed,
                                 weight_col=cfg.get("weight_col"))
    if cfg.get("repeats"):
        ds = source_repeat(ds, cfg["repeats"], seed=seed)
        salt = "epoch"
    if shuffle != "none":
        ds = epoch_shuffle(ds, int(cfg.get("epoch", 0)), seed=seed,
                           scope=shuffle, salt_col=salt)

    # one execution: count and write from the same materialized blocks
    mat = ds.materialize()
    n = mat.count()
    if fmt == "jsonl":
        # keep the replica tag: without it upsampled copies export as
        # byte-identical lines and downstream exact-dedup silently
        # undoes the configured mixing ratio
        write_documents_jsonl(mat, args.output,
                              keep_extra=("epoch",) if salt else ())
    elif shuffle == "none":
        # unshuffled corpora keep the resumable hive layout; a shuffled
        # one must not re-group by source (order is the point)
        mat.write_parquet(args.output, partition_cols=["source"])
    else:
        mat.write_parquet(args.output)
    print(json.dumps({"rows_out": int(n), "output": args.output,
                      "format": fmt, "shuffle": shuffle,
                      "epoch": int(cfg.get("epoch", 0))}), file=_OUT)
    return 0


def load_config(path: str) -> dict:
    """JSON run config (the analogue of the reference's .properties /
    experiment-matrix JSON, twitter.properties / twitter.json).

    Only the keys ``experiment`` actually consumes are accepted —
    anything else is rejected so a config can never carry a key that
    silently has no effect (build parameters belong on the ``build``
    CLI flags)."""
    import json as _json

    allowed = {"input", "algorithms", "partitions", "workloads"}
    with open(path) as f:
        cfg = _json.load(f)
    unknown = set(cfg) - allowed
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return cfg


def _graph_workload_sweep(cfg, algorithms, partitions, workloads) -> list:
    """The reference's full analytics sweep (run_experiments.py:122-157 +
    twitter.json:11-46): every (algorithm x cluster size) cell partitions
    the graph, then runs each workload OVER that partitioning and records
    wall time + result size alongside the partition-quality metrics."""
    import itertools
    import time as _time

    from .analytics import bfs_layers, bfs_partition_pruned, \
        label_edges_multi, partition_edge_rows_multi, \
        two_hop_cross_partition_multi
    from .queries import _event_graph_edges
    from .sources import partition_graph_stream, snap_to_adjacency
    from .vertexstate import ShardedGraph

    edges = _event_graph_edges(cfg["input"])
    adj = snap_to_adjacency(edges).materialize()

    # partition-INVARIANT workloads (pagerank/sssp/CC) run ONCE on a
    # single ShardedGraph shared with the pruned BFS's distances — the
    # same redundancy fix queries.partition_workload_sweep carries
    # (VERDICT r03 ask #4); re-running them per (algorithm, k) cell
    # multiplied experiment wall time for byte-identical results
    g = ShardedGraph(edges)
    invariant: dict[str, dict] = {}
    for wl in workloads:
        t0 = _time.perf_counter()
        if wl == "pagerank":
            n = len(g.pagerank(iterations=20))  # twitter.json:36
        elif wl == "sssp":
            n = len(g.sssp("u0"))
        elif wl == "connectedcomponents":
            n = int(g.connected_components()["component"].nunique())
        elif wl == "bfs_pruned":
            continue  # partition-dependent: runs per cell below
        else:
            raise ValueError(f"unknown workload {wl!r}")
        invariant[wl] = {"wall_sec": round(_time.perf_counter() - t0, 3),
                         "n_rows": n}
    bfs_dist = bfs_layers(edges, "u0", max_depth=6, graph=g) \
        if "bfs_pruned" in workloads else None

    # cells sharing a k also share ONE multi-labeled edge set, ONE
    # 2-hop join and ONE per-partition row-count fold (the same
    # redundancy collapse queries.partition_workload_sweep carries) —
    # the per-algorithm 2-hop joins were the sweep's dominant cost
    by_cell: dict[tuple, dict] = {}
    for k in partitions:
        pms, mets = {}, {}
        for algo in algorithms:
            pms[algo], mets[algo] = partition_graph_stream(
                adj, k=k, algorithm=algo)
        labm = label_edges_multi(edges, pms, k)
        th_all = two_hop_cross_partition_multi(labm, algorithms, k=k)
        prow = partition_edge_rows_multi(labm, algorithms, k) \
            if "bfs_pruned" in workloads else None
        for algo in algorithms:
            met = mets[algo]
            rec = {
                "algorithm": algo,
                "k": k,
                "edge_cut_ratio": round(met["edge_cut_ratio"], 6),
                "imbalance": round(met["imbalance"], 6),
                "workloads": {},
            }
            rec["crossing_fraction"] = round(
                th_all[algo]["crossing_fraction"], 6)
            for wl in workloads:
                if wl == "bfs_pruned":
                    t0 = _time.perf_counter()
                    dist, frac = bfs_partition_pruned(
                        edges, pms[algo], "u0", max_depth=6, k=k,
                        dist=bfs_dist, part_rows=prow[algo])
                    rec["workloads"][wl] = {
                        "wall_sec": round(_time.perf_counter() - t0, 3),
                        "n_rows": len(dist),
                        "scan_fraction": round(frac, 6)}
                else:
                    rec["workloads"][wl] = dict(invariant[wl])
            by_cell[(algo, k)] = rec
    # emit in the original algorithm-major cross-product order
    return [by_cell[(algo, k)]
            for algo, k in itertools.product(algorithms, partitions)]


def cmd_experiment(args) -> int:
    """Config-driven cross-product runs (run_experiments.py:122-149 shape):
    algorithms x partition counts over one input, metrics per run. With a
    ``workloads`` config key the sweep also EXECUTES each analytics
    workload (pagerank / sssp / connectedcomponents / bfs_pruned) over
    every partitioning and reports wall time per cell — the reference's
    complete analytics harness in one command."""
    _init_ray(args.num_cpus)
    import itertools

    from .metrics import imbalance_report
    from .partition import StreamingPartitioner

    cfg = load_config(args.config)
    algorithms = cfg.get("algorithms", ["hash", "ldg", "fennel"])
    partitions = cfg.get("partitions", [16])
    if cfg.get("workloads"):
        print(json.dumps(_graph_workload_sweep(
            cfg, algorithms, partitions, cfg["workloads"]), indent=1),
            file=_OUT)
        return 0
    # shared per-source load aggregation (one combiner-pattern copy)
    from .queries import _source_loads

    agg = None
    results = []
    for algo, k in itertools.product(algorithms, partitions):
        if agg is None:
            agg = _source_loads(cfg["input"])
        sp = StreamingPartitioner(k, algo,
                                  total_load=float(agg["load"].sum()),
                                  total_edges=float(len(agg)),
                                  tie="least_loaded")
        sp.assign_stream(agg["source"].tolist(),
                         loads=agg["load"].to_numpy())
        m = sp.metrics()
        m.update(imbalance_report(m.pop("sizes")))
        results.append(m)
    print(json.dumps(results, indent=1), file=_OUT)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
