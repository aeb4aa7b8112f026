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
    """Vectorized adjacency-line parser (M1/M2 in SURVEY.md §2.2).

    ``labeled=True`` parses ``label,target`` neighbor tokens and drops
    labels outside ``edge_labels`` (LineParser semantics,
    EdgeCutSGP.java:77-94).
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    keep = pc.invert(pc.starts_with(pc.utf8_trim_whitespace(text), "#"))
    text = text.filter(keep)
    parts = pc.split_pattern_regex(text, r"\s+")
    # row i: [vertex, degree, n1..nk]
    plist = parts.to_pylist()  # small fixture files; line-level metadata only
    vertices, degrees, neighbors = [], [], []
    for toks in plist:
        toks = [t for t in toks if t != ""]
        if len(toks) < 2:
            continue
        vertices.append(toks[0])
        degrees.append(int(toks[1]))
        nbrs = toks[2:]
        if labeled:
            out = []
            for nb in nbrs:
                seg = nb.split(",")
                if len(seg) < 2:
                    continue
                if edge_labels is None or seg[0] in edge_labels:
                    out.append(seg[1])
            nbrs = out
        neighbors.append(nbrs)
    return pa.Table.from_arrays(
        [pa.array(vertices, pa.string()), pa.array(degrees, pa.int64()),
         pa.array(neighbors, pa.list_(pa.string()))],
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
        keep = pc.invert(pc.starts_with(pc.utf8_trim_whitespace(text), "#"))
        parts = pc.split_pattern_regex(text.filter(keep), r"\s+")
        flat = parts.to_pylist()
        src = [p[0] for p in flat if len(p) >= 2 and p[0] != p[1]]
        dst = [p[1] for p in flat if len(p) >= 2 and p[0] != p[1]]
        return pa.table({"src": src, "dst": dst})

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

    rd.DataContext.get_current().execution_options.preserve_order = True

    if total_vertices is None:
        total_vertices = adj_ds.count()
    sp = StreamingPartitioner(
        k, algorithm, total_load=float(total_vertices),
        total_edges=float(total_edges) if total_edges else None,
        balance_slack=balance_slack, seed=seed,
    )
    out_v, out_p = [], []
    for batch in adj_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        verts = batch["vertex"].to_pylist()
        nbrs = batch["neighbors"].to_pylist()
        for v, nb in zip(verts, nbrs):
            out_v.append(v)
            out_p.append(sp.assign(v, neighbors=nb))
    pm = pd.DataFrame({"vertex": out_v, "partition": np.array(out_p, dtype=np.int32)})
    return pm, sp.metrics()


def write_partition_map(pm: pd.DataFrame, path: str) -> None:
    """Persist the vertex,partition table (the reference's only resumable
    artifact, EdgeCutSGP.java:247-263) as Parquet."""
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pm, preserve_index=False), path)


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
                ts = pc.cast(ts_col, pa.int64())  # epoch micros -> keep int
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
