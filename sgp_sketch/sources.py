"""Text-format graph sources + sinks (the reference's native formats).

- adjacency list ("adj"): ``vertex_id out_degree n1 n2 ... nk`` per line,
  ``#`` comments skipped (README.md:54-56, EdgeCutSGP.java:218-229);
- edge list ("snap"): ``src dst`` per line (snap2adj.scala:11);
- labeled SNB adjacency: ``vertex|label,target,ts|...`` out/in edge groups
  (csv-converter.scala:41-74) — label filtering per EdgeCutSGP.java:77-94;
- partition-map sink: the ``vertex,partition`` table (EdgeCutSGP.java:247-263)
  written as Parquet.

Parsing is vectorized per batch of lines (Arrow string kernels / one numpy
pass), not per line. ``snap_to_adjacency`` is the reference's Spark ETL
(edge list -> grouped adjacency, snap2adj.scala:8-21) as a Ray groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_str


ADJ_SCHEMA = pa.schema(
    [
        ("vertex", pa.string()),
        ("degree", pa.int64()),
        ("neighbors", pa.list_(pa.string())),
    ]
)


def parse_adjacency_batch(batch: pa.Table, *, edge_labels: set | None = None,
                          labeled: bool = False) -> pa.Table:
    """Vectorized adjacency-line parser (M1/M2 in SURVEY.md §2.2) — Arrow
    string kernels end to end, no per-line Python.

    ``labeled=True`` parses ``label,target`` neighbor tokens and drops
    labels outside ``edge_labels`` (LineParser semantics,
    EdgeCutSGP.java:77-94).
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    t = pc.utf8_trim_whitespace(text)
    keep = pc.and_(pc.invert(pc.starts_with(t, "#")),
                   pc.greater(pc.utf8_length(t), 0))
    t = t.filter(keep)
    parts = pc.split_pattern_regex(t, r"\s+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    parts = parts.filter(pc.greater_equal(pc.list_value_length(parts), 2))
    vertices = pc.list_element(parts, 0)
    degrees = pc.cast(pc.list_element(parts, 1), pa.int64())
    nbrs = pc.list_slice(parts, 2)
    if isinstance(nbrs, pa.ChunkedArray):
        nbrs = nbrs.combine_chunks()
    if labeled:
        n_rows = len(nbrs)
        lens = nbrs.value_lengths().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = nbrs.flatten()
        seg = pc.split_pattern(flat, ",")
        # list_slice is total (list_element is not): token -> 0/1 targets
        tgt_list = pc.list_slice(seg, 1, 2)
        if isinstance(tgt_list, pa.ChunkedArray):
            tgt_list = tgt_list.combine_chunks()
        has_target = (tgt_list.value_lengths().to_numpy(zero_copy_only=False)
                      == 1)
        label = pc.list_element(seg, 0)
        if edge_labels is None:
            label_ok = np.ones(len(flat), dtype=bool)
        else:
            label_ok = pc.is_in(
                label, value_set=pa.array(sorted(edge_labels))
            ).to_numpy(zero_copy_only=False)
        token_keep = has_target & label_ok
        # targets exist only for has_target tokens; align the two masks
        tgt_flat = tgt_list.flatten()
        kept_targets = tgt_flat.filter(pa.array(token_keep[has_target]))
        row_of_token = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        kept_rows = row_of_token[token_keep]
        counts = np.bincount(kept_rows, minlength=n_rows)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        nbrs = pa.ListArray.from_arrays(pa.array(offsets), kept_targets)
        # degree must describe THIS row's neighbor list: after a label
        # filter the file's declared degree over-counts dropped edges
        degrees = pa.array(counts.astype(np.int64), pa.int64())
    return pa.Table.from_arrays(
        [pc.cast(vertices, pa.string()), degrees, pc.cast(nbrs, pa.list_(pa.string()))],
        schema=ADJ_SCHEMA,
    )


def read_adjacency_text(path: str, **parse_kwargs):
    """Adjacency text file -> Dataset(vertex, degree, neighbors)."""
    import ray.data as rd

    ds = rd.read_text(path)
    return ds.map_batches(
        lambda t: parse_adjacency_batch(t, **parse_kwargs),
        batch_format="pyarrow",
    )


def read_snap_edges(path: str):
    """snap edge-list text -> Dataset(src, dst); self-loops dropped
    (snap2metis.scala:41)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # TRIM before splitting: ' a b' would otherwise split to
        # ['', 'a', 'b'] — a bogus ('', 'a') edge and the real one lost
        text = pc.utf8_trim_whitespace(text)
        keep = pc.invert(pc.starts_with(text, "#"))
        parts = pc.split_pattern_regex(text.filter(keep), r"\s+")
        # Arrow kernels end-to-end (module contract: per batch, not per
        # line): first two tokens, drop short lines and self-loops
        ok = pc.greater_equal(pc.list_value_length(parts), 2)
        parts = parts.filter(ok)
        src = pc.list_element(parts, 0)
        dst = pc.list_element(parts, 1)
        real = pc.invert(pc.equal(src, dst))
        return pa.table({"src": src.filter(real), "dst": dst.filter(real)})

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


_ADJ_BUCKETS = 64


def snap_to_adjacency(edges, n_buckets: int = _ADJ_BUCKETS):
    """Edge list -> adjacency (snap2adj.scala:11-16 semantics: sorted,
    deduped neighbor list per vertex).

    Scale shape: a groupby on the raw vertex id would pay Ray's ~10ms
    per-GROUP overhead once per vertex (dead at 41M vertices). Instead the
    vertex space buckets to a SMALL fixed key count; each bucket builds ALL
    its adjacency rows vectorized — one Arrow sort by (src, dst), one
    consecutive-dedup pass, and one ``ListArray.from_arrays`` over the
    run-length offsets. Only (src, dst) pairs cross the shuffle.
    """

    def _bucket(t: pa.Table) -> pa.Table:
        src = t["src"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # hash only the per-batch DICTIONARY of vertices, not every row
        de = src.dictionary_encode()
        dhash = hash_str(np.asarray(de.dictionary.to_pylist(), dtype=object))
        bucket = (dhash % np.uint64(n_buckets)).astype(np.int64)[
            de.indices.to_numpy(zero_copy_only=False)
        ]
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    def _build(g: pa.Table) -> pa.Table:
        g = g.select(["src", "dst"]).sort_by(
            [("src", "ascending"), ("dst", "ascending")]
        )
        sc = g["src"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dc = g["dst"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if len(sc) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64()),
                 pa.array([], pa.list_(pa.string()))], schema=ADJ_SCHEMA)
        # consecutive dedup of (src, dst): the sort made equal pairs adjacent
        keep = np.ones(len(sc), dtype=bool)
        keep[1:] = (sc[1:] != sc[:-1]) | (dc[1:] != dc[:-1])
        t2 = g.filter(pa.array(keep))
        sc2 = sc[keep]
        new_src = np.ones(len(sc2), dtype=bool)
        new_src[1:] = sc2[1:] != sc2[:-1]
        starts = np.flatnonzero(new_src)
        degrees = np.diff(np.append(starts, len(sc2)))
        offsets = np.concatenate(([0], np.cumsum(degrees))).astype(np.int32)
        neighbors = pa.ListArray.from_arrays(
            pa.array(offsets), t2["dst"].combine_chunks())
        vertices = t2["src"].combine_chunks().filter(pa.array(new_src))
        return pa.Table.from_arrays(
            [vertices, pa.array(degrees, pa.int64()), neighbors],
            schema=ADJ_SCHEMA)

    bucketed = edges.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(_build, batch_format="pyarrow")


def partition_graph_stream(adj_ds, k: int, algorithm: str = "ldg", *,
                           total_vertices: int | None = None,
                           total_edges: int | None = None,
                           balance_slack: float = 0.05, seed: int = 42):
    """Run the greedy streaming partitioner over an adjacency Dataset.

    The algorithm is ORDER-DEFINED and sequential (EdgeCutSGP.java:211-246)
    — this driver consumes the stream in order through a single local
    iterator (batches stream with backpressure; state is the small
    assignment dict, not the data). Returns (partition-map DataFrame,
    metrics dict). The scalable variant is the load-mode source assigner
    in pipeline.plan_partitions; this one exists for reference parity.
    """
    from .partition import StreamingPartitioner

    # ORDER-DEFINED algorithm: Ray Data does not preserve input order unless
    # asked — without this, LDG/Fennel assignments (and edge-cut metrics)
    # vary run-to-run, breaking the seeded-determinism goal (SURVEY §2.6 O4).
    import ray.data as rd

    opts = rd.DataContext.get_current().execution_options
    prev_order = opts.preserve_order
    opts.preserve_order = True

    try:
        if total_vertices is None:
            # pin first: count() would execute the (possibly
            # groupby-built) adjacency lineage once and the iter_batches
            # stream below again
            adj_ds = adj_ds.materialize()
            total_vertices = adj_ds.count()
        sp = StreamingPartitioner(
            k, algorithm, total_load=float(total_vertices),
            total_edges=float(total_edges) if total_edges else None,
            balance_slack=balance_slack, seed=seed,
        )
        out_v, out_p = [], []
        for batch in adj_ds.iter_batches(batch_format="pyarrow",
                                         batch_size=4096):
            verts = batch["vertex"].to_pylist()
            nbrs = batch["neighbors"].to_pylist()
            for v, nb in zip(verts, nbrs):
                out_v.append(v)
                out_p.append(sp.assign(v, neighbors=nb))
    finally:
        # the flag is session-GLOBAL: leaving it on would quietly
        # disable out-of-order streaming for every later pipeline in
        # the process (a hidden throughput tax on unrelated shuffles)
        opts.preserve_order = prev_order
    pm = pd.DataFrame({"vertex": out_v, "partition": np.array(out_p, dtype=np.int32)})
    return pm, sp.metrics()


def write_partition_map(pm: pd.DataFrame, path: str) -> None:
    """Persist the vertex,partition table (the reference's only resumable
    artifact, EdgeCutSGP.java:247-263) as Parquet."""
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pm, preserve_index=False), path)


def assign_dense_ids(adj_ds) -> pd.DataFrame:
    """vertex -> dense 1-based id over the SORTED vertex set.

    The reference's METIS conversion assigns dense ordinals with
    zipWithIndex and persists the lookup (adj2metis.scala:44-50,
    id-formatter.scala:47-66, snap2metis.scala:51-65). Ordinals are
    order-defined, so the driver streams the sorted vertex column and
    numbers it sequentially — O(batch) driver memory; the resulting table
    is vocab-scale (one row per vertex, not per edge) and is the sidecar a
    caller persists (write_partition_map shape).
    """
    import ray.data as rd

    opts = rd.DataContext.get_current().execution_options
    prev_order = opts.preserve_order
    opts.preserve_order = True
    try:
        verts = adj_ds.select_columns(["vertex"]).sort("vertex")
        out_v: list = []
        next_id = 1
        out_ids: list = []
        for b in verts.iter_batches(batch_format="pyarrow",
                                    batch_size=65536):
            vs = b["vertex"].to_pylist()
            out_v.extend(vs)
            out_ids.extend(range(next_id, next_id + len(vs)))
            next_id += len(vs)
    finally:
        # session-global flag — restore so later pipelines keep
        # out-of-order streaming (see partition_graph_stream)
        opts.preserve_order = prev_order
    return pd.DataFrame({"vertex": out_v,
                         "dense_id": np.array(out_ids, dtype=np.int64)})


def write_metis(adj_ds, id_map: pd.DataFrame, path: str) -> int:
    """METIS text writer (adj2metis.scala:51-57): header ``n m``, then line
    i holds the space-separated dense ids of vertex i's neighbors.

    Expects undirected adjacency (each edge appears in both endpoint rows;
    m = total_degree / 2 — the reference's reverse-edge union guarantees
    this, snap2metis.scala:44). The dense map broadcasts once via
    ``ray.put``; line formatting runs distributed, the line table sorts by
    dense id in the OBJECT STORE (METIS is inherently one ordered text
    file), and the driver streams sorted batches to disk — it never holds
    more than one batch (the old version kept an O(E) dict of every
    neighbor id on the driver). Returns m.
    """
    import ray

    mapping = dict(zip(id_map["vertex"], id_map["dense_id"]))
    n = len(mapping)
    mref = ray.put(mapping)

    def _lines(b: pa.Table) -> pd.DataFrame:
        mp = ray.get(mref)
        dids, lines, degs = [], [], []
        for v, nbrs in zip(b["vertex"].to_pylist(),
                           b["neighbors"].to_pylist()):
            ids = sorted(mp[x] for x in nbrs if x in mp)
            dids.append(mp[v])
            lines.append(" ".join(map(str, ids)))
            degs.append(len(ids))
        return pd.DataFrame({"dense_id": pd.Series(dids, dtype="int64"),
                             "line": pd.Series(lines, dtype=object),
                             "deg": pd.Series(degs, dtype="int64")})

    rows = adj_ds.map_batches(_lines, batch_format="pyarrow") \
        .sort("dense_id").materialize()
    # single-column Dataset.sum returns a bare scalar (None when empty)
    m = int(rows.sum("deg") or 0) // 2
    expect = 1
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for b in rows.iter_batches(batch_format="pandas"):
            for did, line in zip(b["dense_id"], b["line"]):
                while expect < int(did):  # isolated vertices: empty lines
                    f.write("\n")
                    expect += 1
                f.write(line + "\n")
                expect += 1
        while expect <= n:
            f.write("\n")
            expect += 1
    return m


def read_metis(path: str) -> pd.DataFrame:
    """Parse a METIS adjacency file back to (dense_id, neighbors) rows —
    the round-trip check for write_metis (and the remap-back test shape)."""
    with open(path) as f:
        header = f.readline().split()
        n = int(header[0])
        rows = []
        for i in range(1, n + 1):
            line = f.readline().strip()
            rows.append([int(x) for x in line.split()] if line else [])
    return pd.DataFrame({"dense_id": np.arange(1, n + 1, dtype=np.int64),
                         "neighbors": rows})


SNB_EDGE_SCHEMA = pa.schema(
    [("src", pa.string()), ("dst", pa.string()), ("ts", pa.int64())]
)


def read_snb_edge_csv(path: str, *, src_entity: str, dst_entity: str,
                      delimiter: str = "|"):
    """SNB relational edge CSV (pipe-delimited, header row) -> edge Dataset.

    Reproduces the reference's CSV schema (first_id, second_id, timestamp —
    csv-converter.scala:31-34) with entity-prefixed composite ids
    ("person:123" — :81-169 id compositing) and epoch-millis timestamps.
    """
    import ray.data as rd
    from pyarrow import csv as pacsv

    ds = rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
    )

    def compose(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        src = pc.binary_join_element_wise(
            pa.array([src_entity] * len(batch)), pc.cast(batch[cols[0]], pa.string()), ":"
        )
        dst = pc.binary_join_element_wise(
            pa.array([dst_entity] * len(batch)), pc.cast(batch[cols[1]], pa.string()), ":"
        )
        if len(cols) > 2:
            ts_col = batch[cols[2]]
            if pa.types.is_timestamp(ts_col.type):
                # CSV inference may pick ns/us units — normalize to the
                # reference's epoch MILLIS (creationDateFormat.getTime())
                ts = pc.cast(pc.cast(ts_col, pa.timestamp("ms", tz="UTC")
                                     if ts_col.type.tz else
                                     pa.timestamp("ms")), pa.int64())
            elif pa.types.is_string(ts_col.type):
                parsed = pc.strptime(ts_col, format="%Y-%m-%dT%H:%M:%S.%f%z",
                                     unit="ms")
                ts = pc.cast(parsed, pa.int64())
            else:
                ts = pc.cast(ts_col, pa.int64())
        else:
            ts = pa.array([0] * len(batch), pa.int64())
        return pa.Table.from_arrays([src, dst, ts], schema=SNB_EDGE_SCHEMA)

    return ds.map_batches(compose, batch_format="pyarrow")


def undirect_edges(edges):
    """Emit both (src,dst) and (dst,src) — the reference's reverse-edge
    flatMap (csv-converter.scala:193-203, snap2metis.scala:44)."""

    def rev(batch: pa.Table) -> pa.Table:
        fwd = batch.select(["src", "dst"])
        bwd = pa.Table.from_arrays([batch["dst"], batch["src"]],
                                   names=["src", "dst"])
        return pa.concat_tables([fwd, bwd])

    return edges.map_batches(rev, batch_format="pyarrow")


DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64()),
])


def read_documents_jsonl(path: str):
    """JSONL corpus -> Dataset in the canonical ``documents`` shape
    (``DOCUMENTS_SCHEMA`` — the driver's documents.parquet layout), so a
    JSONL-shipped corpus feeds every document pipeline (tokenize, dedup,
    text analysis) unchanged.

    The common interchange format for web-scale text corpora is one JSON
    object per line; ``ray.data.read_json`` streams it per block (and
    auto-detects ``.gz`` by extension — pinned by test). Required fields:
    ``doc_id`` (integer), ``text``, ``source`` (strings). Optional:
    ``lang`` (null when absent), ``n_chars`` (derived from ``text`` when
    absent — vectorized, no Python loop). Unknown extra fields are
    dropped; a missing required field fails loudly at read time with the
    field name.
    """
    import ray.data as rd

    return rd.read_json(path).map_batches(conform_documents_batch,
                                          batch_format="pyarrow")


def conform_documents_batch(batch: pa.Table,
                            keep_extra: tuple = ()) -> pa.Table:
    """Conform an arbitrary-schema batch to ``DOCUMENTS_SCHEMA``: required
    ``doc_id``/``text``/``source`` fail loudly when absent, ``lang``
    defaults to null, ``n_chars`` derives from ``text`` per-VALUE (JSON
    readers unify the file's schema, so a row missing n_chars arrives as
    a null in an existing column — derive exactly those), unknown extra
    columns are dropped — except the ones named in ``keep_extra``, which
    ride through verbatim after the canonical columns (e.g. the replica
    ``epoch`` tag an upsampled mix must not lose). Shared by the JSONL
    reader and writer so both directions of the interchange agree on the
    canonical shape."""
    names = set(batch.schema.names)
    missing = {"doc_id", "text", "source"} - names
    if missing:
        raise ValueError(
            f"JSONL documents missing required field(s) {sorted(missing)}"
            f" (have {sorted(names)})")
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols = {
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "text": pc.cast(text, pa.string()),
        "lang": (pc.cast(batch["lang"], pa.string()) if "lang" in names
                 else pa.nulls(len(batch), pa.string())),
        "source": pc.cast(batch["source"], pa.string()),
        "n_chars": (pc.coalesce(pc.cast(batch["n_chars"], pa.int64()),
                                pc.cast(pc.utf8_length(text), pa.int64()))
                    if "n_chars" in names
                    else pc.cast(pc.utf8_length(text), pa.int64())),
    }
    out = pa.Table.from_arrays(list(cols.values()),
                               schema=DOCUMENTS_SCHEMA)
    for c in keep_extra:
        if c in names:
            col = batch[c]
            out = out.append_column(
                c, col.combine_chunks()
                if isinstance(col, pa.ChunkedArray) else col)
    return out


def write_documents_jsonl(ds, path: str, *, keep_extra: tuple = ()) -> None:
    """Documents Dataset -> one-JSON-object-per-line files under ``path``
    — the sink counterpart of ``read_documents_jsonl`` (round-trip pinned
    by test), so curated/filtered corpora export in the interchange
    format other systems ingest. Columns are conformed to
    ``DOCUMENTS_SCHEMA`` first (pipeline outputs often carry extra score/
    flag columns; a corpus missing a required column fails loudly) —
    pass ``keep_extra`` to carry named extras through, e.g. the replica
    ``epoch`` tag, without which an upsampled mix exports byte-identical
    duplicate lines that downstream exact-dedup silently collapses.
    ``Dataset.write_json`` streams one file per block — a partitioned,
    resumable layout, never one giant file."""
    ds.map_batches(lambda t: conform_documents_batch(t, keep_extra),
                   batch_format="pyarrow").write_json(path)
