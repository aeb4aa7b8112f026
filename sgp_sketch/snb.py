"""SNB property-graph ingestion: multi-table union -> labeled adjacency.

The reference loads LDBC SNB from 17 pipe-CSV edge tables named
``{src}_{elabel}_{dst}_0_0.csv`` plus one vertex CSV per entity label,
composites ids as ``entity:id``, unions all edge tables, generates reverse
edges and aligns out x in adjacency with a full outer join
(csv-converter.scala:81-210); vertex properties are typed per column
(dates -> epoch millis, ids duplicated as iid/iid_long) with
list-cardinality properties loaded from sidecar CSVs
(SNBParser.groovy:88-302, :240 Cardinality.list; SNBPropertyLoader.groovy).

Ray-Data-first re-expression:

- every edge table is one ``read_snb_edge_csv`` (sources.py) + an
  ``elabel`` column; the union is ``Dataset.union`` — no driver loops;
- the out x in alignment is ONE bucketed shuffle: direction-tagged edge
  rows route by hash(vertex) into 64 fixed groups (never one Ray group
  per vertex — ~10ms/group) and each group assembles both neighbor lists
  vectorized; vertices present in either direction appear exactly once
  (the full-outer semantics of csv-converter.scala:205);
- vertex property tables stay COLUMNAR: each entity loads to an Arrow
  Dataset with typed property columns; list-cardinality sidecars fold to
  ``list<string>`` columns with the same bucket pattern.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_str
from .sources import read_snb_edge_csv

# the 8 vertex labels the reference's SNB schema carries
SNB_VERTEX_LABELS = ("person", "comment", "post", "forum", "organisation",
                     "place", "tag", "tagclass")

_EDGE_FILE_RE = re.compile(
    r"^(?P<src>[a-z]+)_(?P<elabel>[A-Za-z]+)_(?P<dst>[a-z]+)_0_0\.csv$")
_VERTEX_FILE_RE = re.compile(r"^(?P<entity>[a-z]+)_0_0\.csv$")

# SNB property columns parsed as datetimes -> epoch millis
# (SNBParser.groovy:205-207: birthday, creationDate, joinDate)
_DATE_PROPS = ("birthday", "creationDate", "joinDate")

_ADJ_BUCKETS = 64

SNB_LABELED_EDGE_SCHEMA = pa.schema(
    [("src", pa.string()), ("dst", pa.string()),
     ("elabel", pa.string()), ("ts", pa.int64())])

SNB_ADJ_SCHEMA = pa.schema(
    [("vertex", pa.string()), ("degree", pa.int64()),
     ("out_neighbors", pa.list_(pa.string())),
     ("in_neighbors", pa.list_(pa.string()))])


def discover_snb_dir(snb_dir: str) -> tuple[list[dict], list[dict]]:
    """Classify an SNB CSV directory into edge- and vertex-table specs.

    Edge tables: ``{src}_{elabel}_{dst}_0_0.csv`` (csv-converter.scala's
    17 loads); vertex tables: ``{entity}_0_0.csv`` for the 8 labels.
    A two-token name whose middle token is also a vertex label (e.g.
    person_email_emailaddress) is a LIST-CARDINALITY property sidecar,
    not an edge table — those load via ``load_snb_list_property``.
    """
    edges, vertices = [], []
    for fn in sorted(os.listdir(snb_dir)):
        mv = _VERTEX_FILE_RE.match(fn)
        if mv and mv.group("entity") in SNB_VERTEX_LABELS:
            vertices.append({"entity": mv.group("entity"),
                             "path": os.path.join(snb_dir, fn)})
            continue
        me = _EDGE_FILE_RE.match(fn)
        if me and me.group("src") in SNB_VERTEX_LABELS \
                and me.group("dst") in SNB_VERTEX_LABELS:
            edges.append({"src": me.group("src"),
                          "elabel": me.group("elabel"),
                          "dst": me.group("dst"),
                          "path": os.path.join(snb_dir, fn)})
    return edges, vertices


def load_snb_edges(snb_dir: str, *, tables: list[dict] | None = None):
    """Union every SNB edge table into ONE labeled edge Dataset
    (src, dst, elabel, ts) with entity-prefixed composite ids — the
    union half of csv-converter.scala:170-185, kept lazy end to end."""
    specs = tables if tables is not None else discover_snb_dir(snb_dir)[0]
    if not specs:
        raise FileNotFoundError(f"no SNB edge tables in {snb_dir}")

    parts = []
    for spec in specs:
        ds = read_snb_edge_csv(spec["path"], src_entity=spec["src"],
                               dst_entity=spec["dst"])
        lbl = spec["elabel"]

        def _with_label(t: pa.Table, lbl=lbl) -> pa.Table:
            return pa.Table.from_arrays(
                [t["src"], t["dst"],
                 pa.array([lbl] * len(t), pa.string()), t["ts"]],
                schema=SNB_LABELED_EDGE_SCHEMA)

        parts.append(ds.map_batches(_with_label, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def load_snb_vertex_table(path: str, entity: str, *, delimiter: str = "|"):
    """One SNB vertex CSV -> typed columnar Dataset.

    SNBParser.groovy:196-215 semantics: the first column becomes
    ``iid`` ("entity:id") and ``iid_long``; date-typed properties
    (birthday/creationDate/joinDate) parse to epoch millis (GMT); every
    other property stays a string column; ``label`` = entity.
    """
    import ray.data as rd
    from pyarrow import csv as pacsv

    ds = rd.read_csv(path,
                     parse_options=pacsv.ParseOptions(delimiter=delimiter))

    def typed(t: pa.Table) -> pa.Table:
        cols = t.column_names
        id_col = pc.cast(t[cols[0]], pa.string())
        arrays = [
            pc.binary_join_element_wise(
                pa.array([entity] * len(t)), id_col, ":"),
            pc.cast(t[cols[0]], pa.int64()),
            pa.array([entity] * len(t), pa.string()),
        ]
        names = ["iid", "iid_long", "label"]
        for c in cols[1:]:
            col = t[c]
            if c in _DATE_PROPS:
                if pa.types.is_string(col.type):
                    fmt = ("%Y-%m-%d" if c == "birthday"
                           else "%Y-%m-%dT%H:%M:%S.%f%z")
                    col = pc.strptime(col, format=fmt, unit="ms")
                # CSV inference may yield date32 or ns timestamps —
                # normalize everything to epoch MILLIS (the reference's
                # SimpleDateFormat.getTime() unit)
                if pa.types.is_date(col.type) \
                        or pa.types.is_timestamp(col.type):
                    tz = getattr(col.type, "tz", None)
                    col = pc.cast(col, pa.timestamp("ms", tz=tz))
                arrays.append(pc.cast(col, pa.int64()))
            else:
                arrays.append(pc.cast(col, pa.string()))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(typed, batch_format="pyarrow")


def load_snb_list_property(path: str, entity: str, prop: str, *,
                           delimiter: str = "|",
                           n_buckets: int = _ADJ_BUCKETS):
    """LIST-cardinality property sidecar (person_email_emailaddress,
    person_speaks_language — SNBParser.groovy:240) -> Dataset
    (iid, <prop>: list<string>), folded with the 64-bucket pattern."""
    import ray.data as rd
    from pyarrow import csv as pacsv

    ds = rd.read_csv(path,
                     parse_options=pacsv.ParseOptions(delimiter=delimiter))

    def _bucket(t: pa.Table) -> pa.Table:
        cols = t.column_names
        iid = pc.binary_join_element_wise(
            pa.array([entity] * len(t)), pc.cast(t[cols[0]], pa.string()),
            ":")
        h = hash_str(np.asarray(iid.to_pylist(), dtype=object))
        return pa.table({
            "iid": iid,
            "value": pc.cast(t[cols[1]], pa.string()),
            "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
        })

    def _fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("iid", "ascending"), ("value", "ascending")])
        iid = g["iid"].combine_chunks()
        idx = iid.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = idx[1:] != idx[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        values = pa.ListArray.from_arrays(pa.array(offsets),
                                          g["value"].combine_chunks())
        return pa.Table.from_arrays(
            [iid.filter(pa.array(new)), values], names=["iid", prop])

    return ds.map_batches(_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_fold, batch_format="pyarrow")


def edge_token(elabel, target, ts):
    """``elabel,target[,ts]`` — the reference's adjacency edge token
    (csv-converter.scala:41-48: ts omitted when 0)."""
    return f"{elabel},{target},{ts}" if ts else f"{elabel},{target}"


def snb_to_labeled_adjacency(edges, *, n_buckets: int = _ADJ_BUCKETS):
    """Union edge Dataset -> out x in aligned labeled adjacency.

    The reference reduces regular and reverse edge lists per vertex and
    FULL-OUTER-joins them (csv-converter.scala:193-207). Here both
    directions tag-union into one stream, route by hash(vertex) into
    ``n_buckets`` fixed groups, and each group assembles both neighbor
    token lists vectorized — a vertex with only in-edges (or only out-)
    still gets its row, which is exactly the full-outer semantics.
    Neighbor tokens are ``elabel,target[,ts]`` strings, the format
    ``parse_adjacency_batch(labeled=True)`` reads back.
    """

    def _arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    def _tag(t: pa.Table) -> pa.Table:
        ts_str = pc.cast(t["ts"], pa.string())
        tok3 = pc.binary_join_element_wise(
            t["elabel"], t["dst"], ts_str, ",")
        tok2 = pc.binary_join_element_wise(t["elabel"], t["dst"], ",")
        tok_out = pc.if_else(pc.equal(t["ts"], 0), tok2, tok3)
        rtok3 = pc.binary_join_element_wise(
            t["elabel"], t["src"], ts_str, ",")
        rtok2 = pc.binary_join_element_wise(t["elabel"], t["src"], ",")
        tok_in = pc.if_else(pc.equal(t["ts"], 0), rtok2, rtok3)
        vertex = pa.concat_arrays([_arr(t["src"]), _arr(t["dst"])])
        token = pa.concat_arrays([_arr(tok_out), _arr(tok_in)])
        n = len(t)
        direction = pa.array(
            np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]))
        # hash only the per-batch DICTIONARY of vertices, not every row
        # (graph batches repeat endpoints heavily — snap_to_adjacency's
        # pattern)
        de = vertex.dictionary_encode()
        dhash = hash_str(np.asarray(de.dictionary.to_pylist(), dtype=object))
        bucket = (dhash % np.uint64(n_buckets)).astype(np.int64)[
            de.indices.to_numpy(zero_copy_only=False)]
        return pa.table({
            "vertex": vertex, "token": token, "direction": direction,
            "bucket": pa.array(bucket),
        })

    def _assemble(g: pa.Table) -> pa.Table:
        g = g.sort_by([("vertex", "ascending"), ("direction", "ascending"),
                       ("token", "ascending")])
        vert = g["vertex"].combine_chunks()
        idx = vert.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dirs = g["direction"].to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return SNB_ADJ_SCHEMA.empty_table()
        new_v = np.ones(n, dtype=bool)
        new_v[1:] = idx[1:] != idx[:-1]
        # out tokens first within each vertex (direction sorted)
        out_mask = dirs == 0
        seg = np.cumsum(new_v) - 1  # vertex ordinal per row
        n_vert = seg[-1] + 1
        out_counts = np.bincount(seg[out_mask], minlength=n_vert)
        in_counts = np.bincount(seg[~out_mask], minlength=n_vert)
        toks = g["token"].combine_chunks()
        out_offsets = np.concatenate(
            ([0], np.cumsum(out_counts))).astype(np.int32)
        in_offsets = np.concatenate(
            ([0], np.cumsum(in_counts))).astype(np.int32)
        out_list = pa.ListArray.from_arrays(
            pa.array(out_offsets), toks.filter(pa.array(out_mask)))
        in_list = pa.ListArray.from_arrays(
            pa.array(in_offsets), toks.filter(pa.array(~out_mask)))
        vertices = vert.filter(pa.array(new_v))
        return pa.Table.from_arrays(
            [vertices, pa.array(out_counts.astype(np.int64)),
             out_list, in_list], schema=SNB_ADJ_SCHEMA)

    return edges.map_batches(_tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(_assemble, batch_format="pyarrow")


def adjacency_text_lines(adj):
    """Labeled adjacency -> text lines ``vertex degree tok tok ...`` —
    the format ``parse_adjacency_batch(labeled=True)`` parses (out-edges
    only, matching the reference's partitioner input)."""

    def _lines(t: pa.Table) -> pa.Table:
        joined = pc.binary_join(t["out_neighbors"], " ")
        deg = pc.cast(t["degree"], pa.string())
        line = pc.binary_join_element_wise(
            t["vertex"], deg, joined, " ")
        # trailing space for zero-degree vertices is harmless to the parser
        return pa.table({"text": pc.utf8_trim_whitespace(line)})

    return adj.map_batches(_lines, batch_format="pyarrow")


def load_snb_graph(snb_dir: str) -> dict:
    """Discover + load a whole SNB directory.

    Returns {"edges": labeled edge Dataset,
             "adjacency": out x in aligned adjacency Dataset,
             "vertices": {entity: typed property Dataset}}.
    """
    edge_specs, vertex_specs = discover_snb_dir(snb_dir)
    edges = load_snb_edges(snb_dir, tables=edge_specs)
    vertices = {
        spec["entity"]: load_snb_vertex_table(spec["path"], spec["entity"])
        for spec in vertex_specs
    }
    return {"edges": edges,
            "adjacency": snb_to_labeled_adjacency(edges),
            "vertices": vertices}


def join_vertex_properties(ds, vertex_ds, *, on: str = "vertex",
                           props: list[str] | None = None,
                           n_buckets: int = _ADJ_BUCKETS):
    """Attach vertex PROPERTY COLUMNS to any Dataset keyed by composite id
    (adjacency rows, edge endpoints, partition maps); properties stay
    Arrow columns end to end (the SNBPropertyLoader.groovy capability,
    relational-style).

    Ray's hash join rejects list-typed non-key columns (adjacency rows
    carry neighbor lists), so this is the bucket-pattern LEFT join: both
    sides tag-union keyed by hash(id) into ``n_buckets`` fixed groups and
    each group merges vectorized — only each row's bucket copy moves, any
    column type rides along. ``props`` selects property columns (default:
    all but label/iid_long).
    """
    cols = list(vertex_ds.schema().names)
    keep = props if props is not None else [
        c for c in cols if c not in ("iid", "label", "iid_long")]
    left_cols = list(ds.schema().names)
    overlap = set(left_cols) & set(keep)
    if overlap:
        raise ValueError(f"property columns already present: {overlap}")

    def _tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        for c in keep:
            out[c] = None
        out["__side"] = np.int8(0)
        out["__bucket"] = (hash_str(np.asarray(b[on], dtype=object))
                           % np.uint64(n_buckets)).astype(np.int64)
        return out

    def _tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({on: b["iid"]})
        for c in left_cols:
            if c != on:
                out[c] = None
        out = out[[*left_cols]]
        for c in keep:
            out[c] = b[c].to_numpy()
        out["__side"] = np.int8(1)
        out["__bucket"] = (hash_str(np.asarray(b["iid"], dtype=object))
                           % np.uint64(n_buckets)).astype(np.int64)
        return out

    tagged = ds.map_batches(_tag_left, batch_format="pandas").union(
        vertex_ds.select_columns(["iid", *keep]).map_batches(
            _tag_right, batch_format="pandas"))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["__side"] == 0, left_cols].copy()
        right = g.loc[g["__side"] == 1]
        for c in keep:
            left[c] = left[on].map(
                dict(zip(right[on], right[c])))
        return left

    return tagged.groupby("__bucket").map_groups(_merge,
                                                 batch_format="pandas")
