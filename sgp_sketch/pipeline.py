"""The sketch-build pipeline: read -> assign -> update -> merge -> finalize.

Dataflow (all Ray Data, streaming with backpressure — the reference's
bounded-queue producer/consumer pipeline, ADJParser.groovy:74-156, comes for
free from the streaming executor):

1. **plan** — per-source loads via partial aggregation inside
   ``map_batches`` + a tiny ``groupby`` (sources << rows), then the greedy
   salted assigner maps each source to its merge partition(s)
   (partition.py; the analogue of EdgeCutSGP's vertex->partition map).
   The map is broadcast once via ``ray.put`` — never re-shipped per batch.
2. **update** — ``map_batches(SketchUpdater, batch_format="pyarrow")`` over
   the tokens table: per batch, per scope (global + each source present),
   update fresh sketches and emit *partial sketch rows*
   ``(scope, kind, partition_id, payload, n_rows, n_tokens)``. Raw token
   data never crosses a shuffle boundary — only KB-scale partials do.
3. **merge** — ``groupby("partition_id").map_groups``: each merge partition
   reduces its partials per (scope, kind). Because the assigner routes all
   partials of a source to one partition (unless salted), this stage
   produces one row per scope; a second, tiny ``groupby(["scope","kind"])``
   folds cross-partition scopes (global + salted monsters).
4. **finalize** — the handful of merged rows come to the driver; estimates
   are decoded per sketch kind.

Idempotent re-execution: partial emission is a pure function of the batch
content, and Ray replaces (not duplicates) re-executed block outputs, so
merges never double-count (SURVEY.md §7.4 #5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from .hashing import hash_str
from .partition import assign_sources_salted
from .sketches.base import SKETCH_BY_NAME, sketch_from_bytes

SCOPE_GLOBAL = "__global__"

PARTIAL_SCHEMA = pa.schema(
    [
        ("scope", pa.string()),
        ("kind", pa.string()),
        ("partition_id", pa.int32()),
        ("payload", pa.binary()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


@dataclass
class SketchSpec:
    """One sketch to build: which algorithm, over which column, at which scopes."""

    kind: str  # hll | cms | kll | tdigest | bloom | stats | kmv
    value: str = "tokens"  # "tokens" (flattened ids) or "n_tok" (per-row)
    params: dict = field(default_factory=dict)
    per_source: bool = True
    global_scope: bool = True

    def make(self):
        cls = SKETCH_BY_NAME[self.kind]
        params = dict(self.params)
        # per-batch partials default to the compact sparse representation
        if self.kind in ("cms", "bloom") and "sparse" not in params:
            params["sparse"] = True
        return cls(**params)


# Partial payload sizes are the merge-shuffle cost, so sketch params are
# sized per scope family: global sketches get full precision (one per
# partition per batch at most); per-source sketches — emitted per SOURCE per
# batch — use smaller grids (their streams are 1/n_sources of the mass, so
# the absolute error stays proportionally tight).
DEFAULT_SPECS = [
    SketchSpec("hll", value="tokens", per_source=False),          # p=14
    SketchSpec("hll", value="tokens", global_scope=False,
               params={"p": 12}),                                  # 4KB dense
    SketchSpec("cms", value="tokens", per_source=False,
               params={"width": 2048}),                            # 80KB dense
    SketchSpec("cms", value="tokens", global_scope=False,
               params={"width": 512}),                             # 20KB dense
    SketchSpec("kll", value="n_tok"),
    SketchSpec("tdigest", value="n_tok"),
    SketchSpec("bloom", value="tokens", per_source=False),
    SketchSpec("kmv", value="tokens", per_source=False),               # 12KB
]


def _batch_arrays(batch: pa.Table):
    """Decode one Arrow batch into numpy views (zero/low-copy)."""
    tokens = batch["tokens"]
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    # keep the token stream at its native int32 width — the hot path sorts
    # it, and halving the bytes halves the DRAM traffic of the one pass
    # that touches every token (int64 upcast happens only on vocab-scale
    # unique arrays inside the sketches)
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    lens = tokens.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = batch["n_tok"].to_numpy(zero_copy_only=False)
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    de = src.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sources = de.dictionary.to_pylist()
    return flat, lens, n_tok, codes, sources


class SketchUpdater:
    """Stateful actor-pool stage: per batch, emit partial sketch rows.

    ``__init__`` runs once per actor (broadcast partition map fetched from
    the object store there, not per batch); ``__call__`` runs per Arrow
    batch and is fully vectorized: rows are grouped by source via one
    stable argsort, token slices per source are contiguous gathers.
    """

    def __init__(self, specs: list[SketchSpec], k: int, amap_ref=None,
                 skip_partitions: frozenset | None = None,
                 global_per_pid: bool = True,
                 head_sources: frozenset | None = None):
        self.specs = specs
        self.k = k
        self.skip = skip_partitions or frozenset()
        # True: one global partial per partition present in the batch
        # (required for self-contained partition checkpoints). False: one
        # global partial per batch — k-fold fewer partial bytes through the
        # merge shuffle; used by the non-checkpointed pipeline.
        self.global_per_pid = global_per_pid
        # head/tail split for huge source vocabularies: sources outside
        # ``head_sources`` fold into one "src:__tail__" scope per (batch,
        # pid) so partial count is bounded by |head| + k, not |sources|.
        self.head = head_sources
        if amap_ref is not None:
            import ray

            self.amap = ray.get(amap_ref)
        else:
            self.amap = None

    def _source_partitions(self, source: str):
        """Partition id array for a source (len > 1 = salted shards)."""
        if self.amap is not None:
            parts = self.amap.get(source)
            if parts is not None:
                return np.asarray(parts, dtype=np.int64)
        h = int(hash_str(np.array([source], dtype=object))[0])
        return np.array([h % self.k], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, lens, n_tok, codes, sources = _batch_arrays(batch)
        # 31-bit token-id contract: the combined dedup key packs token ids
        # into the low 31 bits of a uint64; a negative id would sign-extend
        # into the combo bits and silently corrupt per-scope counts. The CLI
        # accepts arbitrary parquet, so fail loudly instead (one min/max
        # pass per batch — noise next to the key sort).
        if len(flat):
            lo, hi = int(flat.min()), int(flat.max())
            if lo < 0 or hi > 0x7FFFFFFF:
                raise ValueError(
                    f"token ids must be in [0, 2^31) (got range [{lo}, {hi}]): "
                    "the sketch updater packs ids into 31 bits of its dedup key"
                )
        # doc_ids only materialize when a salted source needs row-level shards
        doc_ids = None
        if self.amap is not None and any(
            len(self.amap.get(s, ())) > 1 for s in sources
        ):
            doc_ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        out = {name: [] for name in ("scope", "kind", "partition_id", "payload",
                                     "n_rows", "n_tokens")}

        def emit(scope, kind, pid, sk, n_rows, n_tokens):
            out["scope"].append(scope)
            out["kind"].append(kind)
            out["partition_id"].append(int(pid))
            out["payload"].append(sk.to_bytes())
            out["n_rows"].append(int(n_rows))
            out["n_tokens"].append(int(n_tokens))

        def update_scope(scope, pid, specs, uniq, ucnt, n_toks, row_vals, n_rows):
            """Update all sketches of one scope slice from its pre-deduped
            (unique token, count) arrays — the dedup sort ran ONCE for the
            whole batch (combined-key run-length), not per sketch."""
            for spec in specs:
                sk = spec.make()
                if spec.value == "tokens":
                    if spec.kind == "cms":
                        sk.update(uniq, weights=ucnt, assume_unique=True)
                    elif spec.kind in ("hll", "bloom"):
                        sk.update(uniq)
                    else:  # rank sketch over token values: needs multiplicity
                        sk.update(np.repeat(uniq, ucnt))
                    emit(scope, spec.kind, pid, sk, n_rows, n_toks)
                else:
                    sk.update(row_vals)
                    emit(scope, spec.kind, pid, sk, n_rows, n_toks)

        # ---- row-level partition ids: pid(source) or, when salted,
        # pid(source)[hash(doc_id) % shards] — deterministic per ROW, so a
        # resumed run recomputes exactly the rows of incomplete partitions
        pid_rows = np.empty(len(n_tok), dtype=np.int64)
        row_order = np.argsort(codes, kind="stable")
        row_bounds = np.searchsorted(codes[row_order], np.arange(len(sources) + 1))
        for si, source in enumerate(sources):
            rows = row_order[row_bounds[si]:row_bounds[si + 1]]
            parts = self._source_partitions(source)
            if len(parts) == 1:
                pid_rows[rows] = parts[0]
            else:
                shard = hash_str(doc_ids[rows]) % np.uint64(len(parts))
                pid_rows[rows] = parts[shard.astype(np.int64)]

        per_source = [s for s in self.specs if s.per_source]
        global_specs = [s for s in self.specs if s.global_scope]

        # ---- segment dedup: rows order by combo (pid-major, then source);
        # tokens gather into contiguous per-combo segments via a
        # grouped-arange permutation, then each segment sorts at native
        # int32 width. This replaces a global (combo<<31|token) uint64 sort
        # — same unique/count results, ~half the DRAM traffic on the one
        # pass that touches every token (the measured scaling bottleneck).
        # pid-major ordering serves BOTH scope families: per-combo runs
        # feed the per-source sketches, and each pid's concatenated
        # *deduped* runs (vocab-sized) re-dedup cheaply for global scope.
        n_src = max(len(sources), 1)
        combo_of_row = pid_rows * n_src + codes  # pid-major
        rorder = np.argsort(combo_of_row, kind="stable")
        cs = combo_of_row[rorder]
        redge = np.empty(len(cs), dtype=bool)
        if len(cs):
            redge[0] = True
            np.not_equal(cs[1:], cs[:-1], out=redge[1:])
        rstarts = np.flatnonzero(redge)
        combos = cs[rstarts]
        rb = np.append(rstarts, len(cs))  # row bounds per combo (in rorder)

        row_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        lens_o = lens[rorder]
        cum_o = np.concatenate(([0], np.cumsum(lens_o)))
        idx = (np.repeat(row_starts[rorder], lens_o)
               + (np.arange(len(flat), dtype=np.int64)
                  - np.repeat(cum_o[:-1], lens_o)))
        flat_g = flat[idx]               # tokens grouped by combo
        # token offsets per combo boundary: rb's last entry is len(rows),
        # so cum_o[rb] already carries the terminal total-token bound
        tok_bounds = cum_o[rb]

        def _run_length(seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            if len(seg) == 0:
                return seg, np.empty(0, dtype=np.int64)
            e = np.empty(len(seg), dtype=bool)
            e[0] = True
            np.not_equal(seg[1:], seg[:-1], out=e[1:])
            s = np.flatnonzero(e)
            return seg[s], np.diff(np.append(s, len(seg)))

        # per-combo sorted-unique runs (computed once, consumed by both
        # the per-source and the global emission below)
        seg_uq: list = []
        seg_uc: list = []
        for j in range(len(combos)):
            seg = np.sort(flat_g[tok_bounds[j]:tok_bounds[j + 1]])
            uq, uc = _run_length(seg)
            seg_uq.append(uq)
            seg_uc.append(uc)

        def _merge_runs(uqs: list, ucs: list) -> tuple[np.ndarray, np.ndarray]:
            """Re-dedup concatenated sorted-unique runs (vocab-scale)."""
            cu = np.concatenate(uqs) if uqs else np.empty(0, flat.dtype)
            cc = np.concatenate(ucs) if ucs else np.empty(0, np.int64)
            order = np.argsort(cu, kind="stable")
            cu, cc = cu[order], cc[order]
            uq, run = _run_length(cu)
            if len(uq) == 0:
                return uq, np.empty(0, dtype=np.int64)
            s = np.concatenate(([0], np.cumsum(run)))[:-1]
            return uq, np.add.reduceat(cc, s)

        # ---- per-source partials, keyed (source, pid); tail sources (when
        # a head set is configured) accumulate into one scope per pid
        if per_source:
            tail: dict[int, list] = {}
            for j, cid in enumerate(combos):
                pid = int(cid) // n_src
                if pid in self.skip:
                    continue
                source = sources[int(cid) % n_src]
                n_toks = int(tok_bounds[j + 1] - tok_bounds[j])
                rsl = rorder[rb[j]:rb[j + 1]]
                if self.head is not None and source not in self.head:
                    slot = tail.setdefault(pid, [[], [], [], 0])
                    slot[0].append(seg_uq[j])
                    slot[1].append(seg_uc[j])
                    slot[2].append(rsl)
                    slot[3] += n_toks
                    continue
                update_scope(f"src:{source}", pid, per_source, seg_uq[j],
                             seg_uc[j], n_toks, n_tok[rsl], len(rsl))
            for pid, (uqs, ucs, rsls, ntoks) in sorted(tail.items()):
                uq, uc = _merge_runs(uqs, ucs)
                rsl = np.concatenate(rsls)
                update_scope("src:__tail__", pid, per_source, uq, uc,
                             ntoks, n_tok[rsl], len(rsl))

        # ---- global-scope partials: re-deduped from the combo-level
        # unique runs — a small second pass over vocab-sized data, never
        # the token stream
        if global_specs and not self.global_per_pid:
            # one global partial for the whole batch
            uq, uc = _merge_runs(seg_uq, seg_uc)
            pid = int(pid_rows[0]) if len(pid_rows) else 0
            update_scope(SCOPE_GLOBAL, pid, global_specs, uq, uc,
                         int(len(flat)), n_tok, len(n_tok))
        elif global_specs:
            # one global partial per partition present in the batch (keeps
            # every partition checkpoint self-contained for resume)
            pid_of_combo = combos // n_src
            gpids = np.unique(pid_of_combo)
            gcb = np.searchsorted(pid_of_combo, gpids)
            gcb = np.append(gcb, len(combos))
            for g, pid in enumerate(gpids):
                if int(pid) in self.skip:
                    continue
                lo, hi = int(gcb[g]), int(gcb[g + 1])
                uq, uc = _merge_runs(seg_uq[lo:hi], seg_uc[lo:hi])
                n_toks = int(tok_bounds[hi] - tok_bounds[lo])
                rsl = rorder[rb[lo]:rb[hi]]
                update_scope(SCOPE_GLOBAL, int(pid), global_specs, uq, uc,
                             n_toks, n_tok[rsl], len(rsl))

        return pa.Table.from_pydict(out, schema=PARTIAL_SCHEMA)


def make_updater_fn(specs, k, amap_ref=None, skip_partitions=None,
                    global_per_pid=True, head_sources=None):
    """Stateless task-pool wrapper around SketchUpdater.

    The updater's only state (specs, k, the broadcast plan ref) is tiny, so
    a plain function beats an actor pool: Ray TASKS reuse warm worker
    processes, while every ACTOR is a fresh process paying the numpy/arrow
    import storm (~2-4s each — measured to dominate the whole build at
    pool sizes > 8). ``ray.get(amap_ref)`` inside is a worker-local plasma
    read, effectively free after the first batch.
    """

    def update_batch(batch: pa.Table) -> pa.Table:
        return SketchUpdater(specs, k, amap_ref, skip_partitions,
                             global_per_pid, head_sources)(batch)

    return update_batch


def merge_partial_group(group: pa.Table) -> pa.Table:
    """Reduce partial sketch rows: one output row per (scope, kind)."""
    scopes = group["scope"].to_pylist()
    kinds = group["kind"].to_pylist()
    payloads = group["payload"].to_pylist()
    pids = group["partition_id"].to_pylist()
    n_rows = group["n_rows"].to_pylist()
    n_toks = group["n_tokens"].to_pylist()
    acc: dict[tuple, list] = {}
    for i, key in enumerate(zip(scopes, kinds)):
        sk = sketch_from_bytes(payloads[i])
        slot = acc.get(key)
        if slot is None:
            acc[key] = [sk, pids[i], n_rows[i], n_toks[i]]
        else:
            slot[0] = slot[0].merge(sk)
            slot[2] += n_rows[i]
            slot[3] += n_toks[i]
    out = {name: [] for name in ("scope", "kind", "partition_id", "payload",
                                 "n_rows", "n_tokens")}
    for (scope, kind), (sk, pid, nr, nt) in sorted(acc.items()):
        out["scope"].append(scope)
        out["kind"].append(kind)
        out["partition_id"].append(pid)
        out["payload"].append(sk.to_bytes())
        out["n_rows"].append(nr)
        out["n_tokens"].append(nt)
    return pa.Table.from_pydict(out, schema=PARTIAL_SCHEMA)


def plan_partitions(ds, k: int, *, by: str = "source", load_col: str = "n_tok"):
    """Stage 1: per-source loads (combiner + tiny groupby) -> salted greedy map.

    Returns (source -> int32 partition array, partition load vector,
    per-source load table as pandas).
    """

    def partial_loads(t: pa.Table) -> pa.Table:
        g = t.group_by(by).aggregate([(load_col, "sum")])
        return g.rename_columns([by, "load"])

    # combiner inside map_batches, then a DRIVER-side dict fold over the
    # tiny per-batch partials (sources << rows): no groupby barrier; the
    # driver only ever sees (source, load) rows
    import pandas as pd

    loads: dict = {}
    for bt in ds.map_batches(partial_loads, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, l in zip(bt[by].to_pylist(), bt["load"].to_pylist()):
            loads[s] = loads.get(s, 0) + int(l)
    agg = pd.DataFrame(
        {by: sorted(loads), "sum(load)": [loads[s] for s in sorted(loads)]}
    )
    amap, sizes = assign_sources_salted(
        agg[by].tolist(), agg["sum(load)"].to_numpy(), k=k
    )
    return amap, sizes, agg


@dataclass
class SketchResult:
    """Finalized pipeline output: merged sketches + run metrics."""

    sketches: dict[tuple, Any]  # (scope, kind) -> Sketch
    counts: dict[tuple, tuple]  # (scope, kind) -> (n_rows, n_tokens)
    metrics: dict

    def get(self, kind: str, scope: str = SCOPE_GLOBAL):
        return self.sketches[(scope, kind)]

    def scopes(self, kind: str) -> list[str]:
        return [s for (s, k) in self.sketches if k == kind]

    def estimates_table(self) -> pa.Table:
        rows = {"scope": [], "kind": [], "n_rows": [], "n_tokens": [], "estimate": []}
        for (scope, kind), sk in sorted(self.sketches.items()):
            nr, nt = self.counts[(scope, kind)]
            rows["scope"].append(scope)
            rows["kind"].append(kind)
            rows["n_rows"].append(nr)
            rows["n_tokens"].append(nt)
            rows["estimate"].append(repr(sk.estimate()))
        return pa.Table.from_pydict(rows)


def build_sketches(
    ds,
    specs: list[SketchSpec] | None = None,
    *,
    k: int = 16,
    batch_size: int = 8192,
    concurrency: int | tuple | None = None,
    plan: bool = True,
    max_tracked_sources: int | None = None,
    plan_ds=None,
) -> SketchResult:
    """Run the full sketch pipeline over a tokens Dataset.

    ``plan=True`` runs the greedy salted partition planner (one cheap
    pre-pass over (source, n_tok) only); ``plan=False`` falls back to hash
    partitioning of sources (the reference's no-information baseline,
    EdgeCutSGP.java:112-133). ``plan_ds`` optionally plans from a SAMPLE
    dataset (e.g. the first shard of a many-shard corpus): the greedy
    assigner only needs *relative* source loads, and Zipf-style source
    mixes are shard-stable, so a sampled plan costs a fraction of the full
    pre-pass while the sketch results stay byte-identical (the plan only
    routes partials; every partial still merges exactly once).
    """
    import ray

    specs = specs if specs is not None else DEFAULT_SPECS
    # concurrency=None -> stateless task pool (warm worker reuse; default).
    # An explicit concurrency opts into an actor pool — only worth it when
    # the broadcast state is big enough that per-task reconstruction hurts.
    t0 = time.perf_counter()
    metrics: dict[str, Any] = {"k": k, "batch_size": batch_size}

    amap_ref = None
    head = None
    if plan:
        src = plan_ds if plan_ds is not None else ds
        amap, sizes, agg = plan_partitions(src.select_columns(["source", "n_tok"]), k)
        if max_tracked_sources is not None and len(agg) > max_tracked_sources:
            top = agg.sort_values("sum(load)", ascending=False)
            head = frozenset(top["source"].head(max_tracked_sources))
            metrics["n_head_sources"] = len(head)
        metrics["plan_sec"] = time.perf_counter() - t0
        metrics["planned_imbalance"] = float(sizes.max() / sizes.mean()) if sizes.mean() else 0.0
        metrics["n_sources"] = len(amap)
        metrics["n_salted"] = int(sum(1 for v in amap.values() if len(v) > 1))
        amap_ref = ray.put(amap)

    t1 = time.perf_counter()
    if concurrency is None:
        partials = ds.map_batches(
            make_updater_fn(specs, k, amap_ref, global_per_pid=False,
                            head_sources=head),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        partials = ds.map_batches(
            SketchUpdater,
            # same options as the task-pool path: dropping head_sources
            # here would re-open the per-source partial blowup that
            # max_tracked_sources bounds, and global_per_pid=True would
            # ship k-fold more global partial bytes
            fn_constructor_args=(specs, k, amap_ref, None, False, head),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # single merge shuffle keyed by partition_id (the greedy plan routes all
    # of a source's partials to one partition, so group count == k — small
    # and balanced); cross-partition scopes (global + salted) fold in the
    # driver-side loop below. The checkpoint path (checkpoint.py) keeps the
    # same stage to persist per-partition state.
    merged = partials.groupby("partition_id").map_groups(
        merge_partial_group, batch_format="pyarrow"
    )
    rows = merged.take_all()
    metrics["build_sec"] = time.perf_counter() - t1

    sketches: dict[tuple, Any] = {}
    counts: dict[tuple, tuple] = {}
    for row in rows:
        key = (row["scope"], row["kind"])
        sk = sketch_from_bytes(row["payload"])
        if key in sketches:  # cross-partition scope (global / salted source)
            sketches[key] = sketches[key].merge(sk)
            nr, nt = counts[key]
            counts[key] = (nr + row["n_rows"], nt + row["n_tokens"])
        else:
            sketches[key] = sk
            counts[key] = (row["n_rows"], row["n_tokens"])

    gkey = (SCOPE_GLOBAL, specs[0].kind) if specs else None
    if gkey in counts:
        nr, nt = counts[gkey]
        metrics["n_rows"] = nr
        metrics["n_tokens"] = nt
        metrics["tokens_per_sec"] = nt / metrics["build_sec"] if metrics["build_sec"] else 0.0
    metrics["total_sec"] = time.perf_counter() - t0
    return SketchResult(sketches, counts, metrics)
