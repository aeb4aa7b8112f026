"""Per-partition sketch checkpoints with lineage + resume.

The reference has no checkpointing — failed multi-hour loads are simply
redone (README.md:305); its only resumable artifact is the
``vertex,partition`` CSV (EdgeCutSGP.java:247-263). The north rule makes
resume a first-class requirement, so the pipeline persists:

- ``plan.json``      — the greedy salted source->partition map + loads
  (the partition-map artifact, reused verbatim on resume so assignment
  never drifts between attempts);
- ``part=<pid>/sketches.parquet`` — that partition's merged sketch rows
  (every scope's contribution from exactly the rows routed to pid — the
  updater keys partials row-deterministically, so partition checkpoints
  are disjoint and exact);
- ``manifest.json``  — lineage per completed partition: input files,
  row/token counts, wall time, completion timestamp.

Resume = load plan + manifest, skip completed partitions (their rows are
dropped inside the updater actors — no wasted sketching), recompute the
rest, final-merge checkpointed + fresh rows. Estimates are byte-identical
to a single-shot run because every sketch merge is associative.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import (
    PARTIAL_SCHEMA,
    SCOPE_GLOBAL,
    DEFAULT_SPECS,
    SketchResult,
    SketchSpec,
    merge_partial_group,
    plan_partitions,
)
from .sketches import sketch_from_bytes


def _plan_path(d):
    return os.path.join(d, "plan.json")


def _manifest_path(d):
    return os.path.join(d, "manifest.json")


def _part_dir(d, pid):
    return os.path.join(d, f"part={pid}")


def load_or_create_plan(ds, ckpt_dir: str, k: int) -> dict:
    """Greedy plan, persisted once; resume always reuses the stored plan."""
    path = _plan_path(ckpt_dir)
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        if stored["k"] != k:
            raise ValueError(f"checkpoint plan has k={stored['k']}, requested {k}")
        return {s: np.asarray(p, dtype=np.int32) for s, p in stored["amap"].items()}
    amap, sizes, agg = plan_partitions(ds.select_columns(["source", "n_tok"]), k)
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "k": k,
                "amap": {s: [int(x) for x in p] for s, p in amap.items()},
                "partition_loads": sizes.tolist(),
                "source_loads": dict(zip(agg["source"], agg["sum(load)"].astype(int))),
            },
            f,
        )
    os.replace(tmp, path)  # atomic publish
    return amap


# schema-metadata key under which each partition parquet records the
# increment ids already folded into it (atomic with the data itself)
_APPLIED_META_KEY = b"sgp.applied_increments"


def _applied_increment_ids(parquet_path: str) -> set:
    """Increment ids recorded in the partition file's own metadata —
    the crash-safe record that travels atomically with the folded data."""
    if not os.path.exists(parquet_path):
        return set()
    meta = pq.read_schema(parquet_path).metadata or {}
    raw = meta.get(_APPLIED_META_KEY)
    return set(json.loads(raw)) if raw else set()


def _load_manifest(ckpt_dir: str) -> dict:
    path = _manifest_path(ckpt_dir)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"partitions": {}}


def _store_manifest(ckpt_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(ckpt_dir))


def run_checkpointed(
    ds,
    ckpt_dir: str,
    specs: list[SketchSpec] | None = None,
    *,
    k: int = 16,
    batch_size: int = 8192,
    concurrency=None,
    input_files: list[str] | None = None,
) -> SketchResult:
    """Sketch pipeline with per-partition checkpoints; safe to re-run after
    a crash — completed partitions are skipped, estimates are identical."""
    import ray

    specs = specs if specs is not None else DEFAULT_SPECS
    del concurrency  # task-pool updater (warm worker reuse); kept for API compat

    t0 = time.perf_counter()
    amap = load_or_create_plan(ds, ckpt_dir, k)
    manifest = _load_manifest(ckpt_dir)
    done = frozenset(int(p) for p in manifest["partitions"])
    metrics = {"k": k, "resumed_partitions": sorted(done)}

    checkpointed_rows: list[dict] = []
    for pid in done:
        t = pq.read_table(os.path.join(_part_dir(ckpt_dir, pid), "sketches.parquet"))
        checkpointed_rows.extend(t.to_pylist())

    fresh_rows: list[dict] = []
    # resume gate is the manifest's base_complete flag, NOT partition
    # count: a plan can route sources to fewer than k partitions, and
    # len(done) < k would then re-stream the whole corpus on EVERY
    # resume of an already-finished build just to produce zero rows
    if not manifest.get("base_complete"):
        amap_ref = ray.put(amap)
        from .pipeline import make_updater_fn

        partials = ds.map_batches(
            make_updater_fn(specs, k, amap_ref, done),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        stage1 = partials.groupby("partition_id").map_groups(
            merge_partial_group, batch_format="pyarrow"
        )
        fresh_rows = stage1.take_all()

        # checkpoint each freshly completed partition atomically
        by_pid: dict[int, list[dict]] = {}
        for row in fresh_rows:
            by_pid.setdefault(int(row["partition_id"]), []).append(row)
        for pid, rows in sorted(by_pid.items()):
            pdir = _part_dir(ckpt_dir, pid)
            os.makedirs(pdir, exist_ok=True)
            table = pa.Table.from_pylist(rows, schema=PARTIAL_SCHEMA)
            tmp = os.path.join(pdir, ".sketches.parquet.tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, os.path.join(pdir, "sketches.parquet"))
            manifest["partitions"][str(pid)] = {
                "n_rows": int(sum(r["n_rows"] for r in rows
                                  if r["scope"] == SCOPE_GLOBAL)),
                "n_tokens": int(sum(r["n_tokens"] for r in rows
                                    if r["scope"] == SCOPE_GLOBAL)),
                "n_scopes": len({r["scope"] for r in rows}),
                "input_files": input_files or [],
                "completed_at_sec": round(time.perf_counter() - t0, 3),
            }
            _store_manifest(ckpt_dir, manifest)

    # the base build is complete once the full input streamed through:
    # every partition that can ever produce base rows is now checkpointed
    # (missing pids simply received no sources). append_increment refuses
    # to fold onto a base that never reached this point.
    if not manifest.get("base_complete"):
        manifest["base_complete"] = True
        _store_manifest(ckpt_dir, manifest)

    # final merge: checkpointed + fresh (tiny, driver-side)
    acc: dict[tuple, list] = {}
    for row in checkpointed_rows + fresh_rows:
        key = (row["scope"], row["kind"])
        sk = sketch_from_bytes(row["payload"])
        slot = acc.get(key)
        if slot is None:
            acc[key] = [sk, row["n_rows"], row["n_tokens"]]
        else:
            slot[0] = slot[0].merge(sk)
            slot[1] += row["n_rows"]
            slot[2] += row["n_tokens"]

    sketches = {key: v[0] for key, v in acc.items()}
    counts = {key: (v[1], v[2]) for key, v in acc.items()}
    gkey = (SCOPE_GLOBAL, specs[0].kind)
    if gkey in counts:
        metrics["n_rows"], metrics["n_tokens"] = counts[gkey]
    metrics["total_sec"] = time.perf_counter() - t0
    metrics["fresh_partitions"] = sorted(
        {int(r["partition_id"]) for r in fresh_rows}
    )
    return SketchResult(sketches, counts, metrics)


def append_increment(
    inc_ds,
    ckpt_dir: str,
    specs: list[SketchSpec] | None = None,
    *,
    batch_size: int = 8192,
    input_files: list[str] | None = None,
) -> SketchResult:
    """INCREMENTAL sketch maintenance: fold a new data increment into an
    existing checkpointed build without touching the base data.

    The streaming analogue the reference's one-shot loader lacks: because
    every sketch merge is associative+commutative, yesterday's checkpoints
    absorb today's partials —

    - the stored plan is REUSED verbatim; sources unseen at plan time are
      assigned greedily to the least-loaded partitions and the extended
      plan is persisted atomically (assignment never drifts between
      increments);
    - the updater streams the INCREMENT only; its per-partition merged
      partials fold into each ``part=<pid>/sketches.parquet`` (one
      deserialize-merge-serialize per (scope, kind), atomic replace);
    - counts and HLL/CMS/Bloom states end exactly as a from-scratch build
      over base+increment (elementwise max / add / or are order-free);
      KLL/t-digest stay within their rank-error bounds (their compaction
      is order-sensitive by design).

    RETRY-SAFE: every increment carries a deterministic id (hash of its
    input files + per-source loads). The applied ids are embedded in each
    partition parquet's OWN schema metadata, so the fold publish and its
    record are one atomic ``os.replace`` — there is no window where the
    data contains an increment the record lacks (a crash between separate
    publish and record steps would otherwise double-count on retry). The
    manifest entry is bookkeeping written after the publish and repaired
    from the parquet metadata if a crash interleaves; the plan.json
    load-accounting write happens only AFTER all folds complete and
    itself records applied ids — so re-running a crashed or duplicate
    append never double-counts CMS/stats/count state or plan loads.
    """
    import hashlib

    import ray

    specs = specs if specs is not None else DEFAULT_SPECS
    t0 = time.perf_counter()

    path = _plan_path(ckpt_dir)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{ckpt_dir} has no plan.json — run run_checkpointed first")
    with open(path) as f:
        stored = json.load(f)
    k = int(stored["k"])
    amap = {s: np.asarray(p, dtype=np.int32) for s, p in stored["amap"].items()}
    loads = np.asarray(stored["partition_loads"], dtype=np.int64)
    source_loads = {s: int(v) for s, v in stored["source_loads"].items()}

    manifest = _load_manifest(ckpt_dir)
    if not manifest.get("base_complete"):
        # appending onto a partial base would create increment-only
        # partition entries that a later resume mistakes for completed
        # BASE partitions, silently dropping their base rows
        raise ValueError(
            f"{ckpt_dir} base build is incomplete (manifest lacks "
            "base_complete) — finish run_checkpointed before appending")

    # increment per-source loads (combiner pass, driver fold — tiny)
    def partial_loads(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n_tok", "sum")])
        return g.rename_columns(["source", "load"])

    inc_loads: dict = {}
    for bt in inc_ds.select_columns(["source", "n_tok"]) \
            .map_batches(partial_loads, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for s, l in zip(bt["source"].to_pylist(), bt["load"].to_pylist()):
            inc_loads[s] = inc_loads.get(s, 0) + int(l)

    # deterministic increment identity: same files + same per-source
    # loads -> same id, so a crashed retry folds each partition once
    inc_id = hashlib.md5(json.dumps(
        {"files": sorted(input_files or []),
         "loads": sorted(inc_loads.items())}).encode()).hexdigest()[:16]

    # extend the plan IN MEMORY: new sources -> least-loaded partitions
    # (greedy, heaviest first — the LDG-style balance rule). A new MONSTER
    # source (load above the mean partition load) SALTS across
    # ceil(load/mean) partitions, same policy as the initial salted plan —
    # sound because sketches merge; without it one increment could hotspot
    # a partition. The plan WRITE is deferred until all folds land.
    new_sources = sorted((s for s in inc_loads if s not in amap),
                         key=lambda s: (-inc_loads[s], s))
    for s in new_sources:
        load = inc_loads[s]
        mean_load = max(float(loads.sum() + load) / k, 1.0)
        width = min(max(int(np.ceil(load / mean_load)), 1), k)
        pids = np.argsort(loads)[:width].astype(np.int32)
        amap[s] = np.sort(pids)
        for p in pids:
            loads[int(p)] += load // width
        source_loads[s] = load
    new_set = set(new_sources)
    for s, l in inc_loads.items():
        if s in new_set:
            continue
        # existing sources keep their stored map; load accounting goes to
        # the first assigned pid (salted sources split inside the updater)
        loads[int(amap[s][0])] += l
        source_loads[s] = source_loads.get(s, 0) + l

    # updater over the increment only
    from .pipeline import make_updater_fn

    amap_ref = ray.put(amap)
    partials = inc_ds.map_batches(
        make_updater_fn(specs, k, amap_ref, frozenset()),
        batch_format="pyarrow", batch_size=batch_size)
    fresh = partials.groupby("partition_id").map_groups(
        merge_partial_group, batch_format="pyarrow").take_all()

    by_pid: dict[int, list[dict]] = {}
    for row in fresh:
        by_pid.setdefault(int(row["partition_id"]), []).append(row)

    skipped_pids = []
    for pid, rows in sorted(by_pid.items()):
        ent = manifest["partitions"].get(str(pid), {
            "n_rows": 0, "n_tokens": 0, "n_scopes": 0, "input_files": []})
        pdir = _part_dir(ckpt_dir, pid)
        base_path = os.path.join(pdir, "sketches.parquet")
        # the parquet file's OWN metadata is the authoritative applied-id
        # record (written atomically WITH the folded data); the manifest
        # entry is derived bookkeeping and may lag after a crash
        applied_ids = _applied_increment_ids(base_path)
        in_manifest = any(inc.get("id") == inc_id
                          for inc in ent.get("increments", []))
        if inc_id in applied_ids or in_manifest:
            skipped_pids.append(pid)  # already folded by a crashed attempt
            if inc_id in applied_ids and not in_manifest:
                # repair: publish landed but the crash hit before the
                # manifest bookkeeping — record it now (counts were
                # already folded into the parquet, atomically)
                ent["n_rows"] += int(sum(r["n_rows"] for r in rows
                                         if r["scope"] == SCOPE_GLOBAL))
                ent["n_tokens"] += int(sum(r["n_tokens"] for r in rows
                                           if r["scope"] == SCOPE_GLOBAL))
                # n_scopes from the PUBLISHED parquet (the increment may
                # have introduced scopes the stale manifest entry missed)
                ent["n_scopes"] = len(set(
                    pq.read_table(base_path, columns=["scope"])["scope"]
                    .to_pylist()))
                ent.setdefault("increments", []).append({
                    "id": inc_id,
                    "input_files": input_files or [],
                    "appended_at_sec": round(time.perf_counter() - t0, 3),
                    "repaired": True})
                manifest["partitions"][str(pid)] = ent
                _store_manifest(ckpt_dir, manifest)
            continue
        acc: dict[tuple, list] = {}
        if os.path.exists(base_path):
            for row in pq.read_table(base_path).to_pylist():
                acc[(row["scope"], row["kind"])] = [
                    sketch_from_bytes(row["payload"]),
                    row["n_rows"], row["n_tokens"]]
        for row in rows:
            key = (row["scope"], row["kind"])
            sk = sketch_from_bytes(row["payload"])
            slot = acc.get(key)
            if slot is None:
                acc[key] = [sk, row["n_rows"], row["n_tokens"]]
            else:
                slot[0] = slot[0].merge(sk)
                slot[1] += row["n_rows"]
                slot[2] += row["n_tokens"]
        merged_rows = [
            {"scope": sc, "kind": kd, "partition_id": pid,
             "payload": v[0].to_bytes(), "n_rows": v[1], "n_tokens": v[2]}
            for (sc, kd), v in sorted(acc.items())]
        os.makedirs(pdir, exist_ok=True)
        table = pa.Table.from_pylist(merged_rows, schema=PARTIAL_SCHEMA)
        # record the increment id IN the published file: one os.replace
        # makes data + applied-id record atomic (no double-count window)
        table = table.replace_schema_metadata({
            _APPLIED_META_KEY: json.dumps(sorted(applied_ids | {inc_id}))})
        wtmp = os.path.join(pdir, ".sketches.parquet.tmp")
        pq.write_table(table, wtmp)
        os.replace(wtmp, base_path)
        ent["n_rows"] += int(sum(r["n_rows"] for r in rows
                                 if r["scope"] == SCOPE_GLOBAL))
        ent["n_tokens"] += int(sum(r["n_tokens"] for r in rows
                                   if r["scope"] == SCOPE_GLOBAL))
        # distinct SCOPES, matching run_checkpointed's definition (acc is
        # keyed by (scope, kind) pairs)
        ent["n_scopes"] = len({sc for (sc, _kd) in acc})
        ent.setdefault("increments", []).append({
            "id": inc_id,
            "input_files": input_files or [],
            "appended_at_sec": round(time.perf_counter() - t0, 3)})
        manifest["partitions"][str(pid)] = ent
        _store_manifest(ckpt_dir, manifest)

    # plan load-accounting publishes LAST, and only once per increment:
    # a crash anywhere above leaves the stored plan untouched, so the
    # retry recomputes the identical extension (greedy over the same
    # stored loads) and the already-folded partitions are skipped by id
    if inc_id not in stored.get("applied_increments", []):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": k,
                       "amap": {s: [int(x) for x in p]
                                for s, p in amap.items()},
                       "partition_loads": [int(x) for x in loads],
                       "source_loads": source_loads,
                       "applied_increments":
                           stored.get("applied_increments", []) + [inc_id]},
                      f)
        os.replace(tmp, path)

    # final merge over ALL checkpointed partitions
    acc2: dict[tuple, list] = {}
    for pid_str in manifest["partitions"]:
        ppath = os.path.join(_part_dir(ckpt_dir, int(pid_str)),
                             "sketches.parquet")
        if not os.path.exists(ppath):
            continue
        for row in pq.read_table(ppath).to_pylist():
            key = (row["scope"], row["kind"])
            sk = sketch_from_bytes(row["payload"])
            slot = acc2.get(key)
            if slot is None:
                acc2[key] = [sk, row["n_rows"], row["n_tokens"]]
            else:
                slot[0] = slot[0].merge(sk)
                slot[1] += row["n_rows"]
                slot[2] += row["n_tokens"]
    sketches = {key: v[0] for key, v in acc2.items()}
    counts = {key: (v[1], v[2]) for key, v in acc2.items()}
    metrics = {"k": k,
               "incremented_partitions": sorted(set(by_pid) - set(skipped_pids)),
               "skipped_partitions": skipped_pids,
               "increment_id": inc_id,
               "new_sources": len(new_sources),
               "total_sec": time.perf_counter() - t0}
    gkey = (SCOPE_GLOBAL, specs[0].kind)
    if gkey in counts:
        metrics["n_rows"], metrics["n_tokens"] = counts[gkey]
    return SketchResult(sketches, counts, metrics)
