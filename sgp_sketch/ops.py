"""Exact relational/text operators (the DuckDB-parity query surface).

These are the exact counterparts of the sketch estimators (SURVEY.md §2.5
A1-A8: grouped aggregation, distinct, counts, percentiles, unions) plus the
reference's ETL shapes (broadcast map-side join M8/J3, groupby-reduce J1),
expressed Ray-Data-first:

- combiners inside ``map_batches`` before every ``groupby`` (partial
  aggregation — rows crossing the shuffle are pre-collapsed);
- broadcast dict joins via ``ray.put`` for small dimension tables;
- exact quantiles via a distributed value-counts histogram (valid when the
  value domain is small, e.g. integer word counts — the data-scale path for
  arbitrary domains is the KLL/t-digest sketch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def join_partitions(default: int = 8) -> int:
    """Hash-join partition count — the ONE tunable every ``Dataset.join``
    call site reads (instead of a hardwired literal in each).

    Counterintuitive measured default: scaling this to the session CPU
    count makes joins SLOWER on a single node. A/B at sf0.1 (minhash
    verify-join pipeline end-to-end, one 32-CPU session, two alternating
    rounds per level): 8 parts 14.4/14.4 s · 16 parts 14.4/17.0 s ·
    32 parts 20.1/20.7 s. Each join partition spawns a shuffle
    aggregator actor, and this host is memory-bandwidth-bound (sort-type
    scaling saturates past ~8 concurrent sorters — BASELINE.md), so
    extra aggregators only add contention and actor overhead.
    Repartitioning the materialized candidate table before the verify
    joins was also measured neutral (18.5-21.4 s at 32 parts either way).

    On a real multi-node cluster the trade flips: 8 partitions would cap
    join parallelism at 8 cores cluster-wide, so deployments should set
    ``SGP_JOIN_PARTS`` to roughly the cluster's aggregate core count
    (each node then hosts its share of aggregators against its OWN
    memory bus — the single-node bandwidth wall does not apply).
    """
    import os

    env = os.environ.get("SGP_JOIN_PARTS")
    return int(env) if env else default


def explode_words(ds, text_col: str = "text", keep: tuple = ("source",)):
    """documents -> one row per word (plus ``keep`` columns), streamed.

    DuckDB parity: ``unnest(string_split(text, ' '))``.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            # an all-null block infers Arrow `null` (no split kernel);
            # cast to the string type the non-degenerate blocks carry
            text = text.cast(pa.string())
        words = pc.split_pattern(text, " ")
        # a null text splits to a null LIST: flatten() skips it, so its
        # length must count as 0 (value_lengths yields null -> NaN ->
        # INT64_MIN after astype, and np.repeat rejects negatives)
        lens = (pc.fill_null(words.value_lengths(), 0)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        cols = {"word": words.flatten()}
        for c in keep:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(pa.array(np.repeat(np.arange(len(lens)), lens)))
        return pa.Table.from_pydict(cols)

    return ds.map_batches(_explode, batch_format="pyarrow")


def word_counts(ds, text_col: str = "text", keep: tuple = ("source",)):
    """(word, *keep) -> cnt with an in-batch combiner before the groupby."""

    exploded = explode_words(ds, text_col, keep)
    group_cols = ["word", *keep]

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(group_cols).aggregate([([], "count_all")])
        return g.rename_columns(group_cols + ["cnt"])

    partial = exploded.map_batches(_partial, batch_format="pyarrow")
    return partial.groupby(group_cols).sum("cnt")


def distinct_count_per_key(ds, key: str, text_col: str = "text"):
    """Exact COUNT(DISTINCT word) GROUP BY key — two-level shuffle,
    first level pre-deduped per batch (combiner)."""

    exploded = explode_words(ds, text_col, keep=(key,))

    def _dedup(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key, "word"]).aggregate([])
        return g

    pairs = exploded.map_batches(_dedup, batch_format="pyarrow")
    distinct_pairs = pairs.groupby([key, "word"]).count()

    def _count_key(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "cnt"])

    return (
        distinct_pairs.map_batches(_count_key, batch_format="pyarrow")
        .groupby(key)
        .sum("cnt")
    )


def global_distinct_count(ds, text_col: str = "text") -> int:
    """Exact global COUNT(DISTINCT word)."""
    exploded = explode_words(ds, text_col, keep=())

    def _dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by(["word"]).aggregate([])

    return exploded.map_batches(_dedup, batch_format="pyarrow").groupby("word").count().count()


def topk_words(ds, k: int = 20, text_col: str = "text"):
    """Top-k words by exact count; deterministic tie-break (cnt desc, word asc)."""
    counts = word_counts(ds, text_col, keep=())
    top = counts.sort(["sum(cnt)", "word"], descending=[True, False]).limit(k)
    return top


def round_half_away(x, digits: int):
    """DuckDB-parity ``round(x, digits)``: half-AWAY-from-zero on the
    scaled double, elementwise. numpy/pandas ``.round`` is half-to-even,
    which disagrees with DuckDB exactly when ``x * 10**digits`` lands on
    a representable half (e.g. jaccard 125/128 at 6 digits: np.round →
    0.976562, DuckDB → 0.976563). Verified bit-identical to DuckDB over
    2600 adversarial cases at digits ∈ {2, 4, 6, 9}."""
    s = 10.0 ** digits
    a = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * s + 0.5) / s, a)


def _disc_rank(q: float, n: int) -> int:
    """0-based ``quantile_disc`` rank ceil(q*n)-1, computed exactly.

    ``repr(q)`` is the shortest decimal that round-trips to ``q`` — the
    same literal our generated SQL embeds, which DuckDB parses as an
    exact DECIMAL — so ``Fraction(repr(q))`` reproduces DuckDB's rank
    bit-for-bit where the float product can be an epsilon off."""
    import math
    from fractions import Fraction

    return math.ceil(Fraction(repr(q)) * n) - 1


def exact_discrete_quantiles(ds, value_col: str, qs: list[float]) -> pd.DataFrame:
    """Exact discrete quantiles (DuckDB quantile_disc / numpy 'lower') via a
    distributed value-counts histogram.

    Scales when the value domain is small (integer token counts); the
    histogram — not the rows — comes to the driver.
    """

    def _vc(batch: pa.Table) -> pa.Table:
        g = batch.group_by([value_col]).aggregate([([], "count_all")])
        return g.rename_columns([value_col, "cnt"])

    hist = (
        ds.select_columns([value_col])
        .map_batches(_vc, batch_format="pyarrow")
        .groupby(value_col)
        .sum("cnt")
        .to_pandas()
        .sort_values(value_col)
        .reset_index(drop=True)
    )
    counts = hist["sum(cnt)"].to_numpy()
    values = hist[value_col].to_numpy()
    if len(counts) == 0:
        # empty stream: NaN per quantile (the KLL/t-digest convention)
        return pd.DataFrame({"q": qs, "value": [float("nan")] * len(qs)})
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        # DuckDB quantile_disc rank: smallest element whose CDF >= q,
        # i.e. 0-based index ceil(q*n)-1 (NOT numpy 'lower' floor(q*(n-1))
        # — the two coincide only when q*n is integral, which masked the
        # difference until a 250-rows-per-group case at sf0.1). The ceil
        # must be EXACT-RATIONAL: DuckDB parses the q literal as DECIMAL,
        # so e.g. q=0.07, n=100 ranks at ceil(7)-1=6 while the float
        # product 7.000000000000001 would ceil to 7 — one row off.
        idx = max(_disc_rank(q, n), 0)
        out.append(values[int(np.searchsorted(cum, idx + 1))])
    return pd.DataFrame({"q": qs, "value": out})


def broadcast_join(ds, small_df: pd.DataFrame, on: str, select: list[str] | None = None):
    """Map-side broadcast join (the reference's ``sc.broadcast(lookup)``
    pattern, adj2metis.scala:33,44-48): the small side is put in the object
    store once and merged per batch inside ``map_batches``."""
    import ray

    if select is not None:
        cols = list(dict.fromkeys([on, *select]))
        small_df = small_df[cols]
    ref = ray.put(small_df)

    # stateless task fn, NOT an actor pool: ray.get of the broadcast is a
    # worker-local plasma read per batch (the make_updater_fn pattern —
    # effectively free), while an actor pool pays ~4s cold start each and
    # is the documented two-pool deadlock shape on small sessions
    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how="inner")

    return ds.map_batches(joiner, batch_format="pandas")


def asof_join(left, right, *, on: str, by: str, right_on: str | None = None,
              right_by: str | None = None, tiebreak: str | None = None,
              num_buckets: int = 64):
    """Backward as-of join (inner): each LEFT row pairs with the latest
    RIGHT row whose ``right_on`` <= ``on`` within the same by-key.

    Ray Data has no as-of join, so this is the bucket-pattern composition:
    hash the by-key into ``num_buckets`` FIXED buckets on both sides (one
    co-partitioning shuffle each), union the tagged streams, and run ONE
    ``groupby(bucket).map_groups`` whose kernel is ``pd.merge_asof`` (C
    mergesort) over the sorted bucket. No all-pairs, no per-key groups
    (the ~10ms/Ray-group trap), and the only movement is each row to its
    bucket — skew is bounded by per-key volume, and bucket count is the
    block-size knob at scale.

    Right-side ties on (by, on) are broken deterministically: the row with
    the max ``tiebreak`` wins. (SQL ASOF JOIN is tie-nondeterministic;
    oracle parity requires pre-deduplicating the right side the same way.)
    Both sides must have disjoint column names, and integer columns must be
    non-null IN THE INPUT (a null int column converts through float64 in
    pandas — pre-fill or cast nullable ints upstream). The tagged union's
    own null-padding never reaches pandas: each side's columns are sliced
    from the Arrow group BEFORE conversion, so int64 values of any
    magnitude (including > 2**53) survive exactly.
    """
    r_on = right_on or on
    r_by = right_by or by
    ls, rs = left.schema(), right.schema()
    l_pa = pa.schema(list(zip(ls.names, ls.types)))
    r_pa = pa.schema(list(zip(rs.names, rs.types)))
    l_names, r_names = list(l_pa.names), list(r_pa.names)
    overlap = set(l_names) & set(r_names)
    if overlap:
        raise ValueError(f"asof_join requires disjoint columns, got {overlap}")
    full = pa.schema(list(l_pa) + list(r_pa))
    l_dtypes = {c: d for c, d in
                l_pa.empty_table().to_pandas().dtypes.to_dict().items()}
    r_dtypes = {c: d for c, d in
                r_pa.empty_table().to_pandas().dtypes.to_dict().items()}

    def _tag(side: int, key_col: str, own: set):
        def f(t: pa.Table) -> pa.Table:
            key = t[key_col].to_pandas().to_numpy()
            bucket = (pd.util.hash_array(key) % num_buckets).astype("int64")
            cols, names = [], []
            for fld in full:
                if fld.name in own:
                    col = t[fld.name]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    cols.append(col)
                else:
                    cols.append(pa.nulls(len(t), type=fld.type))
                names.append(fld.name)
            cols.append(pa.array(bucket))
            names.append("__bucket")
            cols.append(pa.array(np.full(len(t), side, dtype=np.int8)))
            names.append("__side")
            return pa.Table.from_arrays(cols, names=names)
        return f

    tagged = left.map_batches(_tag(0, by, set(l_names)),
                              batch_format="pyarrow") \
        .union(right.map_batches(_tag(1, r_by, set(r_names)),
                                 batch_format="pyarrow"))
    out_dtypes = {**l_dtypes, **r_dtypes}

    _NULLABLE = {"int8": "Int8", "int16": "Int16", "int32": "Int32",
                 "int64": "Int64", "uint8": "UInt8", "uint16": "UInt16",
                 "uint32": "UInt32", "uint64": "UInt64"}

    def _merge(g: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        side = g["__side"]
        # slice each side's OWN columns from the Arrow table before any
        # pandas conversion: the other side's null padding (which would
        # widen int64 -> float64 and corrupt values > 2**53) never makes
        # it into a pandas frame
        l = g.filter(pc.equal(side, 0)).select(l_names).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(r_names).to_pandas()
        if l.empty or r.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in out_dtypes.items()})
        l = l.sort_values(on, kind="mergesort")
        if tiebreak is not None:
            r = r.sort_values([r_by, r_on, tiebreak], kind="mergesort") \
                 .drop_duplicates([r_by, r_on], keep="last")
        r = r.sort_values(r_on, kind="mergesort")
        # unmatched left rows take NaN in right-side columns inside
        # merge_asof, which would widen int columns through float64: carry
        # right ints as pandas NULLABLE ints (exact at any magnitude) and
        # keep an exact nullable copy of the right key for match filtering
        for c in r.columns:
            nc = _NULLABLE.get(str(r[c].dtype))
            if nc and c not in (r_on, r_by):
                r[c] = r[c].astype(nc)
        r["__r_key"] = r[r_on].astype(
            _NULLABLE.get(str(r[r_on].dtype), r[r_on].dtype))
        out = pd.merge_asof(l, r, left_on=on, right_on=r_on,
                            left_by=by, right_by=r_by, direction="backward")
        out = out[out["__r_key"].notna()]
        out[r_on] = out["__r_key"]  # exact values, no float64 passage
        out[r_by] = out[by]  # matched rows have equal keys; left is exact
        out = out.drop(columns=["__r_key"])
        return out.astype(out_dtypes)

    return tagged.groupby("__bucket").map_groups(_merge,
                                                 batch_format="pyarrow")


def interval_join(left, right, *, key: str, left_t: str, right_key: str,
                  right_start: str, right_end: str, grid_us: int,
                  num_partitions: int | None = None):
    """Range (interval) join: each LEFT row pairs with every RIGHT row of
    the same key whose [start, end) interval contains the left timestamp.

    Ray Data has no range join; the scale shape is TIME-GRID co-bucketing:
    right rows replicate into every grid cell their interval covers
    (bounded by interval_width/grid_us + 1 copies — pick ``grid_us`` at or
    above the max interval width so it is <= 2), left rows key into their
    single cell, and ONE equi hash join on (key, cell) finds all
    candidates; an exact containment filter finishes. Each matching pair
    meets in exactly one cell (the left row's), so no dedup pass is
    needed. All timestamps must be Arrow timestamps; comparison happens on
    int64 epoch-us.
    """
    if num_partitions is None:
        num_partitions = join_partitions()

    def _us(col) -> np.ndarray:
        # grid_us is an EPOCH-MICROSECOND contract: normalize any
        # timestamp unit through Arrow first (a ns-unit column read as
        # raw int64 would make every interval cover 1000x more grid
        # cells — a silent replication blowup, not just wrong cells)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us", getattr(col.type, "tz", None)))
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)

    def _left_cells(t: pa.Table) -> pa.Table:
        # FLOOR division via numpy: Arrow's divide truncates toward zero,
        # which would put negative (pre-1970) timestamps in a different
        # cell than the right side's floor and silently miss matches
        ts = _us(t[left_t])
        cell = ts // grid_us
        return t.append_column("__cell", pa.array(cell.astype("int64")))

    def _right_cells(t: pa.Table) -> pa.Table:
        if not len(t):
            # the starts/offset idiom below is not empty-safe
            # (np.repeat of a length-1 starts array against length-0
            # reps raises); emit the schema-consistent empty block
            return t.append_column("__cell", pa.array([], pa.int64()))
        lo = _us(t[right_start])
        hi = _us(t[right_end])
        c0 = lo // grid_us
        c1 = np.maximum((hi - 1) // grid_us, c0)  # end exclusive
        reps = (c1 - c0 + 1).astype("int64")
        idx = np.repeat(np.arange(len(t)), reps)
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
        cells = c0[idx] + off
        out = t.take(pa.array(idx))
        return out.append_column("__cell", pa.array(cells.astype("int64")))

    lc = left.map_batches(_left_cells, batch_format="pyarrow")
    rc = right.map_batches(_right_cells, batch_format="pyarrow")
    joined = lc.join(rc, join_type="inner", num_partitions=num_partitions,
                     on=(key, "__cell"), right_on=(right_key, "__cell"))

    def _contain(t: pa.Table) -> pa.Table:
        # same unit normalization as the cell routing: raw int64 ticks
        # from mixed-unit sides would silently drop every cross-unit match
        def _ticks(col):
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us",
                                            getattr(col.type, "tz", None)))
            return pc.cast(col, pa.int64())

        ts = _ticks(t[left_t])
        lo = _ticks(t[right_start])
        hi = _ticks(t[right_end])
        keep = pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi))
        out = t.filter(keep)
        return out.drop_columns(["__cell"])

    return joined.map_batches(_contain, batch_format="pyarrow")


def pack_sequences(ds, *, cap: int, id_col: str = "doc_id",
                   len_col: str = "n_tok", num_buckets: int = 64):
    """Sequence packing (the LLM-training sample-packing step): documents
    pack greedily into sequences of at most ``cap`` tokens.

    Deterministic and distributed: docs hash-route into ``num_buckets``
    fixed buckets (ONE shuffle of (id, len) rows — payloads never move),
    pack NEXT-FIT in doc-id order inside each bucket. The packing loop
    iterates over SEQUENCES, not docs (each boundary is one searchsorted
    on the length cumsum), so a bucket of k docs forming s sequences costs
    O(s log k) plus the sort. Docs longer than ``cap`` become singleton
    (oversize) sequences — never dropped, never split.

    Returns one manifest row per doc: (id, len, bucket, seq) where ``seq``
    numbers sequences within the bucket; (bucket, seq) is the global
    sequence key.
    """

    def _route(b: pd.DataFrame) -> pd.DataFrame:
        from .hashing import hash_i64, hash_str

        out = b[[id_col, len_col]].copy()
        ids = b[id_col].to_numpy()
        # splitmix64 for integer ids: the repo's standard int hash, and
        # exactly reproducible in the DuckDB oracle (limb-split mod-2^64
        # arithmetic) — see queries.PACKED_SEQUENCES_SQL
        hv = hash_i64(ids) if ids.dtype.kind in "iu" else hash_str(ids)
        out["bucket"] = (hv % np.uint64(num_buckets)).astype("int64")
        return out

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.sort_values(id_col)
        lens = g2[len_col].to_numpy(dtype=np.int64)
        n = len(lens)
        cum = np.concatenate([[0], np.cumsum(lens)])
        seq = np.empty(n, dtype=np.int64)
        i = sid = 0
        while i < n:
            # furthest j with sum(lens[i:j]) <= cap; oversize doc -> j=i+1
            j = int(np.searchsorted(cum, cum[i] + cap, side="right")) - 1
            j = max(j, i + 1)
            seq[i:j] = sid
            sid += 1
            i = j
        out = g2.copy()
        out["seq"] = seq
        return out

    return ds.map_batches(_route, batch_format="pandas") \
        .groupby("bucket").map_groups(_pack, batch_format="pandas")


def split_by_partition(ds, col: str, k: int):
    """Split a Dataset into ``k`` per-partition Datasets in ONE sorted pass.

    The scale-safe replacement for "k filter(...).materialize() rescans"
    (VERDICT r03 "What's wrong" #2/#3): a cheap single-column count pass,
    one distributed ``sort(col)`` (the only all-to-all), then
    ``split_at_indices`` carves the sorted Dataset at the per-partition
    boundaries — block metadata splits, no re-scan, no driver-side rows.
    ``col`` must be integers in ``[0, k)``. Returns (list of k Datasets,
    int64 row-count array).

    The input pins in the object store first: the count pass and the sort
    both consume it, and re-running an expensive upstream pipeline twice
    would cost more than the (spillable) materialization.
    """
    ds = ds.materialize()
    counts = np.zeros(k, dtype=np.int64)
    if ds.count() == 0:
        return [ds for _ in range(k)], counts

    def _cnt(t: pa.Table) -> pa.Table:
        c = np.bincount(t[col].to_numpy(zero_copy_only=False),
                        minlength=k).astype(np.int64)
        return pa.table({"p": np.arange(k, dtype=np.int64), "n": c})

    for b in ds.select_columns([col]) \
            .map_batches(_cnt, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        # np.add.at: a yielded batch can concatenate several per-input
        # partials, so partition ids REPEAT within one fold
        np.add.at(counts, b["p"].to_numpy(), b["n"].to_numpy())

    srt = ds.sort(col)
    parts = srt.split_at_indices(np.cumsum(counts)[:-1].tolist())
    return parts, counts


def drop_empty_blocks(ds, schema: "pa.Schema | None" = None):
    """Scrub zero-row blocks from a Dataset before a ``Dataset.join``.

    Ray 2.49's hash-aggregate operators (``groupby().aggregate()`` /
    ``map_groups``) emit SCHEMA-LESS empty blocks for shuffle partitions
    that received no groups, and downstream map stages pass those blocks
    through WITHOUT invoking the UDF (visible as the "Operator produced a
    RefBundle with a different schema ... new schema: ." warnings). A
    ``Dataset.join`` that resolves its side schema from such a block — or
    whose hash partition receives only them — fails inside Acero with
    "No match or multiple matches for key field reference", and WHICH
    block goes first is scheduling-dependent, so the failure is flaky.

    An aggregate output is already fully materialized (the groupby is an
    all-to-all barrier), so filtering at the block-ref level costs one
    metadata-only Ray task per block: Arrow deserialization is zero-copy
    and ``num_rows`` never touches the row data. Rows never move and
    never visit the driver. ``schema`` types the result when EVERY block
    is empty (a legitimately empty aggregate, e.g. a filter that matched
    nothing); without it a fully-empty input is returned unchanged.
    """
    import ray
    import ray.data as rd

    # materialize FIRST: ``to_arrow_refs`` internally calls
    # ``self.schema(fetch_if_missing=True)`` AFTER consuming the ref
    # bundles, and on a lazy post-shuffle lineage that schema probe
    # re-executes the whole upstream as a limit=1 plan (a limit cannot
    # prune through an all-to-all barrier — measured 1.9s of redundant
    # join+sort per scrub at sf0.1). A materialized dataset answers
    # schema() from block metadata.
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    nrows = ray.get([_nrows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, nrows) if n]
    if keep:
        return rd.from_arrow_refs(keep)
    if schema is not None:
        return rd.from_arrow(schema.empty_table())
    return mat


def source_quota_sample(ds, quotas: dict, *, key_col: str = "source",
                        id_col: str = "doc_id", seed: int = 0,
                        weight_col: str | None = None):
    """Deterministic per-source downsampling — the data-MIXING step of a
    training-data pipeline (cap source s at ``quotas[s]`` documents;
    sources absent from ``quotas`` pass through in full).

    A row survives iff its id's hash ranks among the ``q`` smallest
    within its source — a uniform, seedable sample that is EXACT and
    independent of block layout / arrival order (rank is a pure function
    of the id set, unlike ``ds.limit`` or reservoir order). For integer
    ids splitmix64 is a bijection on uint64, so distinct ids never tie
    and exactly ``min(q, n_s)`` rows survive; string ids use SipHash
    (collision odds ~n²/2⁶⁵ — astronomically rare, and a collision can
    only make the count off by its multiplicity, never non-deterministic).

    Scale shape (two streaming passes, KMV/bottom-k style):
    1. a (key, id)-only combiner keeps each batch's ``q`` smallest hashes
       per quota'd source (argpartition — O(batch)); one small
       ``groupby(key)`` folds partials to the q-th-smallest THRESHOLD per
       source (sources are low-cardinality by this engine's design; the
       shuffle carries ≤ q·n_batches 16-byte rows, never documents);
    2. the full rows stream through one filter against the broadcast
       (source -> threshold) map. Payload columns move only here, and
       only survivors move on.

    ``weight_col`` switches quotas from document COUNTS to WEIGHT
    BUDGETS (the real unit of data mixing is tokens): a source keeps
    its docs in hash order while the running inclusive weight stays
    within ``quotas[s]`` — so the kept set never exceeds the budget,
    is still exact and layout-independent, and the batch combiner's
    prune stays valid (a row whose own batch already exceeds the budget
    before it can never be under the global threshold; the first
    overshooter per batch rides along as a blocker so the fold's
    cumsum never undercounts the mass below a candidate hash). A budget of 0
    drops the source entirely, exactly like a count quota of 0 (the
    one divergence from a literal ``running_weight <= budget`` rule,
    which would keep zero-weight docs under a zero budget).
    """
    import ray

    from .hashing import hash_i64, hash_str

    if any(int(q) < 0 for q in quotas.values()):
        raise ValueError("quotas must be >= 0")
    quotas = {k: int(v) for k, v in quotas.items()}
    capped = {k for k, v in quotas.items() if v > 0}

    def _hashes(ids: np.ndarray) -> np.ndarray:
        return (hash_i64(ids, seed=seed) if ids.dtype.kind in "iu"
                else hash_str(ids, seed=seed))

    def _partial(t: pa.Table) -> pa.Table:
        src = t[key_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w_all = (t[weight_col].to_numpy(zero_copy_only=False)
                 .astype(np.int64) if weight_col else None)
        if w_all is not None and len(w_all) and w_all.min() < 0:
            # the batch prune and the running-cumsum threshold are only
            # valid for monotone prefixes — negative weights would make
            # both silently wrong, so fail loudly instead
            raise ValueError(f"{weight_col} must be non-negative")
        uniq, inv = np.unique(src, return_inverse=True)
        keys, hs, ws = [], [], []
        for u_i, u in enumerate(uniq):
            q = quotas.get(u)
            if not q:  # uncapped (pass-through) or quota 0 (dropped)
                continue
            m = inv == u_i
            h = _hashes(ids[m])
            if weight_col:
                # budget prune: keep rows in hash order while the
                # inclusive running weight fits the budget — a row whose
                # OWN batch already overshoots before it cannot rank
                # under the global threshold either. The FIRST
                # overshooting row must still ride along as a blocker:
                # its weight mass is what tells the fold that every
                # larger hash is over budget too (without it the fold's
                # cumsum undercounts and readmits dropped rows — e.g. a
                # zero-weight doc hashed just above a heavy blocker)
                order = np.argsort(h)
                w = w_all[m][order]
                k = int(np.searchsorted(np.cumsum(w), q, side="right"))
                k = min(k + 1, len(w))
                h = h[order[:k]]
                ws.append(w[:k])
            elif len(h) > q:
                h = np.partition(h, q - 1)[:q]
            keys.append(np.full(len(h), u, dtype=object))
            hs.append(h)
        if not keys:
            out = {key_col: pa.array([], pa.string()),
                   "h": pa.array([], pa.uint64())}
            if weight_col:
                out["w"] = pa.array([], pa.int64())
            return pa.table(out)
        out = {key_col: pa.array(np.concatenate(keys), pa.string()),
               "h": pa.array(np.concatenate(hs), pa.uint64())}
        if weight_col:
            out["w"] = pa.array(np.concatenate(ws) if ws else
                                np.array([], dtype=np.int64), pa.int64())
        return pa.table(out)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g[key_col].iloc[0]
        h = g["h"].to_numpy(dtype=np.uint64)
        q = quotas[u]
        if weight_col:
            order = np.argsort(h)
            w = g["w"].to_numpy(dtype=np.int64)[order]
            k = int(np.searchsorted(np.cumsum(w), q, side="right"))
            if k == 0:  # even the smallest-hash doc overshoots: drop all
                return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                     "thr": pd.Series([], dtype=np.uint64)})
            thr = h[order[k - 1]]
        else:
            # each batch contributed its q smallest, so the union contains
            # the global q smallest; threshold = q-th smallest (or max when
            # the source has fewer than q rows -> keep all)
            thr = np.partition(h, q - 1)[q - 1] if len(h) >= q else h.max()
        return pd.DataFrame({key_col: [u], "thr": [np.uint64(thr)]})

    if capped:
        sel = [key_col, id_col] + ([weight_col] if weight_col else [])
        thr_df = (ds.select_columns(sel)
                  .map_batches(_partial, batch_format="pyarrow")
                  .groupby(key_col).map_groups(_fold, batch_format="pandas")
                  .to_pandas())
        # every fold group can come back empty (each capped source's
        # budget below its smallest-hash doc) — Ray 2.49's empty
        # to_pandas() drops ALL columns, so guard before subscripting
        thr_map = ({} if thr_df.empty else
                   dict(zip(thr_df[key_col],
                            thr_df["thr"].to_numpy(np.uint64))))
    else:  # every quota is 0: nothing needs a threshold pass
        thr_map = {}
    ref = ray.put(thr_map)

    def _filter(t: pa.Table) -> pa.Table:
        thr = ray.get(ref)
        src = t[key_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(src, return_inverse=True)
        keep = np.ones(len(src), dtype=bool)
        h = None
        for u_i, u in enumerate(uniq):
            if u not in quotas:
                continue  # uncapped source: keep in full
            m = inv == u_i
            t_u = thr.get(u)
            if t_u is None:  # quota 0, or capped source absent in pass 1
                keep[m] = False
                continue
            if h is None:
                h = _hashes(t[id_col].to_numpy(zero_copy_only=False))
            keep[m] = h[m] <= t_u
        return t.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def source_repeat(ds, factors: dict, *, key_col: str = "source",
                  id_col: str = "doc_id", seed: int = 0,
                  epoch_col: str | None = "epoch"):
    """Deterministic per-source UPsampling — the other half of data
    mixing (``source_quota_sample`` caps; this repeats). Source ``s``
    emits each row ``floor(factors[s])`` times plus one more for the
    ids whose hash falls under the fractional part — so a 2.25 factor
    repeats every doc twice and a deterministic, layout-independent
    quarter of them a third time (expected volume = 2.25x, exact per
    id, seedable). Sources absent from ``factors`` emit once; factor 0
    drops a source.

    Pure single-pass ``map_batches`` (no shuffle, no driver state):
    each batch expands via one ``take``. ``epoch_col`` (default
    ``"epoch"``) numbers the copies 0..reps-1 so downstream exact-dedup
    or groupby stages can tell replicas apart; pass ``None`` to omit.
    """
    from .hashing import hash_i64, hash_str

    if any(f < 0 for f in factors.values()):
        raise ValueError("factors must be >= 0")

    def _check_epoch_col(t: pa.Table) -> None:
        # Arrow append_column allows duplicate names SILENTLY — a table
        # already carrying the epoch column would grow a second one and
        # break downstream selects confusingly; fail loudly instead
        if epoch_col is not None and epoch_col in t.schema.names:
            raise ValueError(
                f"input already has a {epoch_col!r} column; pass "
                f"epoch_col=None or another name")
    fracs = {k: (int(np.floor(f)), float(f) - int(np.floor(f)))
             for k, f in factors.items()}

    def _expand(t: pa.Table) -> pa.Table:
        _check_epoch_col(t)
        if not len(t):
            # empty blocks reach map UDFs (an upstream quota-0 filter
            # empties a source's blocks); the epoch-offset np.repeat
            # below is not empty-safe, so short-circuit with the
            # schema-consistent empty block
            return (t if epoch_col is None else
                    t.append_column(epoch_col, pa.array([], pa.int64())))
        src = t[key_col].to_numpy(zero_copy_only=False)
        reps = np.ones(len(src), dtype=np.int64)
        h = None
        uniq, inv = np.unique(src, return_inverse=True)
        for u_i, u in enumerate(uniq):
            fr = fracs.get(u)
            if fr is None:
                continue
            base, frac = fr
            m = inv == u_i
            reps[m] = base
            if frac > 0.0:
                if h is None:
                    ids = t[id_col].to_numpy(zero_copy_only=False)
                    h = (hash_i64(ids, seed=seed)
                         if ids.dtype.kind in "iu"
                         else hash_str(ids, seed=seed))
                cut = np.uint64(int(frac * float(1 << 64)))
                reps[m] += (h[m] < cut).astype(np.int64)
        idx = np.repeat(np.arange(len(src), dtype=np.int64), reps)
        out = t.take(pa.array(idx))
        if epoch_col is not None:
            starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
            epoch = np.arange(len(idx), dtype=np.int64) - np.repeat(
                starts, reps)
            out = out.append_column(epoch_col, pa.array(epoch))
        return out

    return ds.map_batches(_expand, batch_format="pyarrow")


def epoch_shuffle(ds, epoch: int = 0, *, id_col: str = "doc_id",
                  seed: int = 0x5EED, scope: str = "global",
                  salt_col: str | None = None):
    """Deterministic, layout-independent per-epoch corpus shuffle for
    training-data delivery: each epoch streams the corpus in a different
    but exactly reproducible order. The sort key is ``hash_i64/hash_str``
    of the id mixed with ``(seed, epoch)``, so the order depends only on
    the id set — never on block layout, partitioning or arrival order
    (Ray's ``random_shuffle`` is neither layout-stable nor replayable,
    which breaks resumable training jobs that must re-derive "where was
    I in epoch 3").

    ``scope="global"``: one all-to-all range-partitioned sort — the
    inherent (and only) cost of a TRUE global permutation; blocks stream
    through the shuffle, nothing materializes on the driver. Distinct
    integer ids never tie (splitmix64 is a bijection per mix); string
    ids tie only on a 64-bit SipHash collision. Rows SHARING an id hash
    equal, so their relative order is the one case that stays
    layout-dependent — shuffle after dedup / id assignment, pick an
    ``id_col`` that is unique, or pass ``salt_col`` (e.g. the replica
    ``epoch`` column ``source_repeat`` writes): the key becomes
    splitmix64(hash(id) ^ hash(salt)), so (id, salt)-distinct rows get
    distinct keys and upsampled copies SPREAD through the epoch instead
    of riding adjacent.

    ``scope="blocks"``: the cheap approximate path — seeded
    ``randomize_block_order`` plus the same deterministic hash-argsort
    WITHIN each batch, no shuffle at all. Mixing is local (rows never
    leave their block), and the order is reproducible only for a fixed
    block layout — the documented trade for zero movement at 100 TB.
    """
    from .hashing import hash_i64, hash_str, splitmix64

    if scope not in ("global", "blocks"):
        raise ValueError(f"scope must be 'global' or 'blocks', got {scope!r}")
    mix = ((int(seed) & 0xFFFFFFFFFFFFFFFF) * 1_000_003 + int(epoch) + 1) \
        & 0xFFFFFFFFFFFFFFFF

    def _col_hash(t: pa.Table, col: str) -> np.ndarray:
        v = t[col].to_numpy(zero_copy_only=False)
        return (hash_i64(v, seed=mix) if v.dtype.kind in "iu"
                else hash_str(v, seed=mix))

    def _hash(t: pa.Table) -> np.ndarray:
        h = _col_hash(t, id_col)
        if salt_col is not None:
            h = splitmix64(h ^ _col_hash(t, salt_col))
        return h

    if scope == "blocks":
        def _perm(t: pa.Table) -> pa.Table:
            if not len(t):
                return t
            return t.take(pa.array(np.argsort(_hash(t), kind="stable")))

        return ds.randomize_block_order(seed=mix & 0x7FFFFFFF) \
                 .map_batches(_perm, batch_format="pyarrow")

    key = "__epoch_shuffle_key"

    def _key(t: pa.Table) -> pa.Table:
        # uint64 -> order-preserving int64 (flip the sign bit): Ray's
        # sort boundary math is safest on a signed native key
        k = (_hash(t) ^ np.uint64(1 << 63)).view(np.int64)
        return t.append_column(key, pa.array(k))

    return ds.map_batches(_key, batch_format="pyarrow") \
             .sort(key).drop_columns([key])
