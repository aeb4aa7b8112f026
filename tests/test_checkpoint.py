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

        # simulate a crash that lost partitions 1 and 3 mid-run
        manifest = json.load(open(_manifest_path(ckpt_dir)))
        for pid in ("1", "3"):
            del manifest["partitions"][pid]
            shutil.rmtree(os.path.join(ckpt_dir, f"part={pid}"))
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
