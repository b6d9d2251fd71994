"""Composed curation pipeline (pipeline/curate.py): the checkpointed
runner must equal the lazy gated composition, resume at a stage
boundary without recomputation or drift, survive a mid-stage partial
write, and emit coherent per-stage metrics. The end-to-end VALUE truth
is the DuckDB oracle (corpus_curate_pipeline, tools/check_oracles.py);
these tests pin the resumability contract."""
from __future__ import annotations

import json
import os

from jsonld_js_spark.operators.dedup import eval_set_df
from jsonld_js_spark.pipeline.curate import (
    STAGES, curate_corpus_df, q_corpus_curate_pipeline,
    run_curation_checkpointed)

SF = "/root/testdata/sf0.001"


def _inputs(spark):
    return curate_corpus_df(spark, SF), eval_set_df(spark, SF)


def _final(spark, wh):
    return sorted(
        tuple(r) for r in
        spark.read.parquet(os.path.join(wh, "curate_pack")).collect())


def test_curate_checkpointed_matches_lazy(spark, tmp_path):
    docs, ev = _inputs(spark)
    wh = str(tmp_path / "wh")
    stats = run_curation_checkpointed(spark, docs, ev, wh)
    assert stats["ran"] == list(STAGES) and stats["skipped"] == []
    lazy = sorted(tuple(r) for r in
                  q_corpus_curate_pipeline(spark, SF).collect())
    assert _final(spark, wh) == lazy

    # metrics coherence: one row per stage, chained docs_in/docs_out,
    # nothing dropped silently (tokens_dropped recorded, >= 0)
    m = stats["metrics"]
    assert [r["stage"] for r in m] == list(STAGES)
    for a, b in zip(m, m[1:]):
        assert a["docs_out"] == b["docs_in"]
    for r in m:
        assert r["docs_out"] <= r["docs_in"]
        assert r["tokens_dropped"] >= 0
        assert r["wall_s"] >= 0


def test_curate_kill_resume_at_stage_boundary(spark, tmp_path):
    docs, ev = _inputs(spark)
    wh = str(tmp_path / "wh")
    # "kill" after the near-dedup stage commits
    part = run_curation_checkpointed(spark, docs, ev, wh, max_stages=3)
    assert part["ran"] == list(STAGES[:3])
    marker = os.path.join(wh, "_lineage", "curate", "2.json")
    before = json.load(open(marker))

    full = run_curation_checkpointed(spark, docs, ev, wh)
    assert full["skipped"] == list(STAGES[:3])
    assert full["ran"] == list(STAGES[3:])
    # committed stages were NOT recomputed: marker byte-identical
    assert json.load(open(marker)) == before

    # resumed result == clean uninterrupted run
    wh2 = str(tmp_path / "wh2")
    run_curation_checkpointed(spark, docs, ev, wh2)
    assert _final(spark, wh) == _final(spark, wh2)


def test_curate_partial_write_is_discarded(spark, tmp_path):
    docs, ev = _inputs(spark)
    wh = str(tmp_path / "wh")
    run_curation_checkpointed(spark, docs, ev, wh, max_stages=2)
    # a killed run left a partial (unmarked) stage-3 directory
    part_dir = os.path.join(wh, "curate_dedup_near")
    os.makedirs(part_dir, exist_ok=True)
    with open(os.path.join(part_dir, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    full = run_curation_checkpointed(spark, docs, ev, wh)
    assert full["skipped"] == list(STAGES[:2])
    lazy = sorted(tuple(r) for r in
                  q_corpus_curate_pipeline(spark, SF).collect())
    assert _final(spark, wh) == lazy
