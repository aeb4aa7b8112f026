"""Checkpoint/resume tests (SURVEY.md §5 resume strategy): kill after
partial completion, resume, byte-identical final estimates."""

import json
import os
import shutil

import numpy as np
import pytest

from sgp_sketch.checkpoint import run_checkpointed, _manifest_path
from sgp_sketch.pipeline import SCOPE_GLOBAL, build_sketches
from sgp_sketch.schema import tokens_dataset


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


class TestCheckpointResume:
    def test_full_run_writes_all_partitions(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        res = run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)
        manifest = json.load(open(_manifest_path(ckpt_dir)))
        assert len(manifest["partitions"]) == 4
        assert os.path.exists(os.path.join(ckpt_dir, "plan.json"))
        assert res.metrics["n_rows"] == 500

    def test_matches_unchckpointed_run(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        res_c = run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)
        res_p = build_sketches(tokens_dataset(sf_small), k=4, batch_size=100,
                               concurrency=2)
        assert np.array_equal(res_c.get("hll").registers,
                              res_p.get("hll").registers)
        assert res_c.counts[(SCOPE_GLOBAL, "hll")] == \
            res_p.counts[(SCOPE_GLOBAL, "hll")]

    def test_kill_and_resume_identical(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        full = run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)

        # simulate a crash that lost partitions 1 and 3 mid-run: a real
        # mid-run crash dies BEFORE base_complete is written (the flag is
        # the last step of a full pass), so drop it too
        manifest = json.load(open(_manifest_path(ckpt_dir)))
        for pid in ("1", "3"):
            del manifest["partitions"][pid]
            shutil.rmtree(os.path.join(ckpt_dir, f"part={pid}"))
        manifest.pop("base_complete", None)
        with open(_manifest_path(ckpt_dir), "w") as f:
            json.dump(manifest, f)

        resumed = run_checkpointed(tokens_dataset(sf_small), ckpt_dir, k=4,
                                   batch_size=100, concurrency=2)
        assert resumed.metrics["resumed_partitions"] == [0, 2]
        assert sorted(resumed.metrics["fresh_partitions"]) == [1, 3]
        # byte-identical estimates after resume
        assert np.array_equal(resumed.get("hll").registers,
                              full.get("hll").registers)
        for scope in full.scopes("hll"):
            assert resumed.get("hll", scope).estimate() == \
                full.get("hll", scope).estimate()
        assert resumed.counts == full.counts

    def test_fully_complete_resume_skips_compute(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)
        resumed = run_checkpointed(tokens_dataset(sf_small), ckpt_dir, k=4,
                                   batch_size=100, concurrency=2)
        assert resumed.metrics["fresh_partitions"] == []
        assert resumed.metrics["n_rows"] == 500

    def test_complete_build_with_empty_partitions_skips_restream(
            self, sf_small, ckpt_dir):
        # a plan can route every source to fewer than k partitions; the
        # resume gate must be base_complete, not len(done) == k, or every
        # resume of a finished build re-streams the corpus for zero rows.
        # The greedy planner balances all k, so pin the scenario with a
        # stored plan (resume always reuses the stored plan verbatim)
        # that routes every source to partitions 0-3 of k=8.
        import pyarrow.parquet as _pq
        from sgp_sketch.schema import documents_path

        srcs = sorted(set(_pq.read_table(
            documents_path(sf_small), columns=["source"])["source"]
            .to_pylist()))
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "plan.json"), "w") as f:
            json.dump({"k": 8,
                       "amap": {s: [i % 4] for i, s in enumerate(srcs)}},
                      f)
        full = run_checkpointed(tokens_dataset(sf_small), ckpt_dir, k=8,
                                batch_size=100, concurrency=2)
        manifest = json.load(open(_manifest_path(ckpt_dir)))
        assert len(manifest["partitions"]) < 8
        assert manifest["base_complete"] is True

        def boom(t):
            raise RuntimeError("resume re-streamed a complete build")

        poisoned = tokens_dataset(sf_small).map_batches(
            boom, batch_format="pyarrow")
        resumed = run_checkpointed(poisoned, ckpt_dir, k=8,
                                   batch_size=100, concurrency=2)
        assert resumed.metrics["fresh_partitions"] == []
        assert resumed.counts == full.counts

    def test_plan_is_stable_across_resume(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)
        plan1 = json.load(open(os.path.join(ckpt_dir, "plan.json")))
        run_checkpointed(tokens_dataset(sf_small), ckpt_dir, k=4,
                         batch_size=100, concurrency=2)
        plan2 = json.load(open(os.path.join(ckpt_dir, "plan.json")))
        assert plan1 == plan2

    def test_k_mismatch_rejected(self, sf_small, ckpt_dir):
        ds = tokens_dataset(sf_small)
        run_checkpointed(ds, ckpt_dir, k=4, batch_size=100, concurrency=2)
        with pytest.raises(ValueError, match="k=4"):
            run_checkpointed(tokens_dataset(sf_small), ckpt_dir, k=8,
                             batch_size=100, concurrency=2)


class TestRealKillResume:
    def test_sigkill_mid_run_then_resume(self, tmp_path, sf_small):
        """Launch the checkpointed build in a real subprocess, SIGKILL it as
        soon as the first partition checkpoint lands, resume, and compare
        against a clean run — the SURVEY §5 kill/resume scenario without
        manifest surgery."""
        import os
        import signal
        import subprocess
        import sys
        import time

        ckpt = str(tmp_path / "kill_ckpt")
        script = (
            "import ray\n"
            "ray.init(address='local', num_cpus=4, include_dashboard=False,"
            " logging_level='ERROR')\n"
            "from ray.data import DataContext\n"
            "DataContext.get_current().enable_progress_bars = False\n"
            "from sgp_sketch.checkpoint import run_checkpointed\n"
            "from sgp_sketch.schema import tokens_dataset\n"
            f"run_checkpointed(tokens_dataset({sf_small!r}), {ckpt!r}, k=4,"
            " batch_size=50)\n"
        )
        proc = subprocess.Popen([sys.executable, "-c", script],
                                cwd="/root/repo",
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        deadline = time.time() + 120
        first_part = None
        while time.time() < deadline and proc.poll() is None:
            done = [d for d in (os.listdir(ckpt) if os.path.exists(ckpt) else [])
                    if d.startswith("part=")]
            if done:
                first_part = done
                break
            time.sleep(0.2)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
        # whether we caught it mid-flight or it finished, resume must work
        resumed = run_checkpointed(tokens_dataset(sf_small), ckpt, k=4,
                                   batch_size=50)
        clean = run_checkpointed(tokens_dataset(sf_small),
                                 str(tmp_path / "clean_ckpt"), k=4,
                                 batch_size=50)
        assert np.array_equal(resumed.get("hll").registers,
                              clean.get("hll").registers)
        assert resumed.counts == clean.counts
        assert resumed.metrics["n_rows"] == 500


class TestIncrement:
    def _halves(self, sf_small):
        import pyarrow.compute as pc

        from sgp_sketch.schema import documents_path, tokenize_documents_batch
        import ray.data as rd

        def part(lo: bool):
            ds = rd.read_parquet(documents_path(sf_small),
                                 columns=["doc_id", "text", "source"])

            def f(t):
                import numpy as np
                import pyarrow as pa

                ids = t["doc_id"].to_pandas().to_numpy().astype("int64")
                m = (ids % 2 == 0) if lo else (ids % 2 == 1)
                return t.filter(pa.array(m))

            return ds.map_batches(f, batch_format="pyarrow") \
                .map_batches(tokenize_documents_batch, batch_format="pyarrow")

        return part(True), part(False)

    def test_append_increment_matches_full_build(self, sf_small, tmp_path):
        from sgp_sketch.checkpoint import append_increment, run_checkpointed
        from sgp_sketch.pipeline import build_sketches
        from sgp_sketch.schema import tokens_dataset

        base, inc = self._halves(sf_small)
        ckpt = str(tmp_path / "inc_ckpt")
        run_checkpointed(base, ckpt, k=4, batch_size=100)
        res = append_increment(inc, ckpt, batch_size=100)
        full = build_sketches(tokens_dataset(sf_small), k=4, batch_size=100)

        # counts exact
        assert res.metrics["n_rows"] == full.metrics["n_rows"]
        assert res.metrics["n_tokens"] == full.metrics["n_tokens"]
        # order-free sketches end in EXACTLY the full-build state
        assert res.get("hll").estimate() == full.get("hll").estimate()
        # bloom byte layout depends on when sparse->dense switched (merge
        # tree shape), but the BIT SET must be identical — densify both
        bi, bf = res.get("bloom"), full.get("bloom")
        bi._densify()
        bf._densify()
        assert np.array_equal(bi.words, bf.words)
        cms_i, cms_f = res.get("cms"), full.get("cms")
        hh = cms_f.heavy_hitters(10)
        toks = np.array([t for t, _ in hh], dtype=np.int64)
        assert np.array_equal(cms_i.estimate_counts(toks),
                              np.array([c for _, c in hh], dtype=np.int64))
        # order-sensitive sketches stay within their rank bounds
        qi = res.get("kll").quantile(0.5)
        qf = full.get("kll").quantile(0.5)
        assert abs(qi - qf) <= max(2.0, 0.1 * max(abs(qf), 1))

    def test_increment_with_new_source_extends_plan(self, sf_small, tmp_path):
        import json as _json

        import pandas as pd
        import ray.data as rd

        from sgp_sketch.checkpoint import append_increment, run_checkpointed
        from sgp_sketch.schema import tokens_dataset

        ckpt = str(tmp_path / "ns_ckpt")
        run_checkpointed(tokens_dataset(sf_small), ckpt, k=4, batch_size=100)
        with open(f"{ckpt}/plan.json") as f:
            before = _json.load(f)
        inc = rd.from_pandas(pd.DataFrame({
            "doc_id": ["brand_new_1", "brand_new_2"],
            "tokens": [[1, 2, 3], [4, 5, 6, 7]],
            "n_tok": [3, 4],
            "source": ["brand_new_source", "brand_new_source"],
        }))
        res = append_increment(inc, ckpt)
        with open(f"{ckpt}/plan.json") as f:
            after = _json.load(f)
        assert "brand_new_source" in after["amap"]
        assert "brand_new_source" not in before["amap"]
        assert res.metrics["new_sources"] == 1
        # planned loads are token counts: final total = base plan + 7 new
        assert res.metrics["n_tokens"] == sum(before["partition_loads"]) + 7
        assert sum(after["partition_loads"]) == sum(before["partition_loads"]) + 7

    def test_increment_salts_new_monster_source(self, sf_small, tmp_path):
        import json as _json

        import pandas as pd
        import ray.data as rd

        from sgp_sketch.checkpoint import append_increment, run_checkpointed
        from sgp_sketch.schema import tokens_dataset

        ckpt = str(tmp_path / "monster_ckpt")
        base = run_checkpointed(tokens_dataset(sf_small), ckpt, k=4,
                                batch_size=100)
        # a monster source ~2x the whole base corpus
        n_tok = int(base.metrics["n_tokens"]) * 2
        rows = 50
        per = n_tok // rows
        inc = rd.from_pandas(pd.DataFrame({
            "doc_id": [f"m{i}" for i in range(rows)],
            "tokens": [list(range(per))] * rows,
            "n_tok": [per] * rows,
            "source": ["monster"] * rows,
        }))
        res = append_increment(inc, ckpt)
        with open(f"{ckpt}/plan.json") as f:
            plan = _json.load(f)
        assert len(plan["amap"]["monster"]) > 1  # salted across partitions
        assert res.metrics["n_rows"] == base.metrics["n_rows"] + rows

    def test_duplicate_append_is_idempotent(self, sf_small, tmp_path):
        """Retrying an already-applied increment must not double-count
        CMS/stats/count state or plan loads (crash-retry contract)."""
        import json as _json

        from sgp_sketch.checkpoint import append_increment, run_checkpointed

        base, inc = self._halves(sf_small)
        ckpt = str(tmp_path / "idem_ckpt")
        run_checkpointed(base, ckpt, k=4, batch_size=100)
        first = append_increment(inc, ckpt, batch_size=100,
                                 input_files=["inc-0"])
        with open(f"{ckpt}/plan.json") as f:
            plan1 = _json.load(f)
        again = append_increment(inc, ckpt, batch_size=100,
                                 input_files=["inc-0"])
        with open(f"{ckpt}/plan.json") as f:
            plan2 = _json.load(f)
        # every partition skipped, counts unchanged, plan loads unchanged
        assert again.metrics["incremented_partitions"] == []
        assert set(again.metrics["skipped_partitions"]) \
            == set(first.metrics["incremented_partitions"])
        assert again.metrics["n_rows"] == first.metrics["n_rows"]
        assert again.metrics["n_tokens"] == first.metrics["n_tokens"]
        assert again.get("hll").estimate() == first.get("hll").estimate()
        assert plan2["partition_loads"] == plan1["partition_loads"]
        assert plan2["applied_increments"] == plan1["applied_increments"]

    def test_append_requires_complete_base(self, sf_small, tmp_path):
        import pytest

        from sgp_sketch.checkpoint import (_store_manifest, _load_manifest,
                                           append_increment,
                                           run_checkpointed)

        base, inc = self._halves(sf_small)
        ckpt = str(tmp_path / "partial_ckpt")
        run_checkpointed(base, ckpt, k=4, batch_size=100)
        man = _load_manifest(ckpt)
        man.pop("base_complete", None)  # simulate a crashed base build
        _store_manifest(ckpt, man)
        with pytest.raises(ValueError, match="base build is incomplete"):
            append_increment(inc, ckpt, batch_size=100)

    def test_crash_between_publish_and_manifest_is_idempotent(
            self, sf_small, tmp_path):
        """The publish (os.replace of the folded parquet) and its record
        travel atomically: the applied increment ids live in the parquet's
        own schema metadata. Simulate the crash window — parquet published,
        manifest entry NOT yet updated — and assert the retry skips the
        fold (no double-counted CMS/stats/counts) and repairs the manifest.
        """
        import copy
        import json as _json

        from sgp_sketch.checkpoint import (_load_manifest, _store_manifest,
                                           append_increment,
                                           run_checkpointed)

        base, inc = self._halves(sf_small)
        ckpt = str(tmp_path / "crash_ckpt")
        run_checkpointed(base, ckpt, k=4, batch_size=100)
        pre = copy.deepcopy(_load_manifest(ckpt))
        first = append_increment(inc, ckpt, batch_size=100,
                                 input_files=["inc-0"])
        touched = first.metrics["incremented_partitions"]
        assert touched, "fixture must touch at least one partition"
        # crash simulation: one partition's parquet holds the increment
        # (schema metadata included) but its manifest entry reverted to
        # the pre-append state — exactly the window ADVICE.md describes
        man = _load_manifest(ckpt)
        victim = str(touched[0])
        man["partitions"][victim] = pre["partitions"][victim]
        # and the plan write never happened either
        with open(f"{ckpt}/plan.json") as f:
            plan_after = _json.load(f)
        _store_manifest(ckpt, man)

        retry = append_increment(inc, ckpt, batch_size=100,
                                 input_files=["inc-0"])
        # every partition skipped — the parquet metadata is authoritative
        assert retry.metrics["incremented_partitions"] == []
        assert set(retry.metrics["skipped_partitions"]) == set(touched)
        # totals identical to the clean first append (no double count)
        assert retry.metrics["n_rows"] == first.metrics["n_rows"]
        assert retry.metrics["n_tokens"] == first.metrics["n_tokens"]
        assert retry.get("hll").estimate() == first.get("hll").estimate()
        cms_r, cms_f = retry.get("cms"), first.get("cms")
        hh = cms_f.heavy_hitters(10)
        toks = np.array([t for t, _ in hh], dtype=np.int64)
        assert np.array_equal(cms_r.estimate_counts(toks),
                              np.array([c for _, c in hh], dtype=np.int64))
        # manifest repaired: the victim's entry holds the increment again
        man2 = _load_manifest(ckpt)
        incs = man2["partitions"][victim].get("increments", [])
        assert any(i.get("repaired") for i in incs)
        # plan loads unchanged by the retry
        with open(f"{ckpt}/plan.json") as f:
            plan_retry = _json.load(f)
        assert plan_retry["partition_loads"] == plan_after["partition_loads"]
        assert plan_retry["applied_increments"] \
            == plan_after["applied_increments"]
