"""Engine config (SURVEY §7.4: parameters are config, not constants).

The sketch/index knobs (LSH planes, IVF stride/nprobe, minhash
hashes/bands) come from ``config.CONFIG`` (env-overridable) and the
operator builders accept explicit overrides. These tests pin that a
NON-default knob value still verifies against its replayed DuckDB oracle
— i.e. tuning for scale cannot silently break the differential gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinejobs_indexer_spark import config as cfg  # noqa: E402
from pipelinejobs_indexer_spark.llm import dedup, similarity  # noqa: E402

from parity import assert_frames_match  # noqa: E402


def test_from_env_reads_overrides(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LSH_PLANES", "8")
    monkeypatch.setenv("SPARK_GRAFT_IVF_CENT_STRIDE", "101")
    monkeypatch.setenv("SPARK_GRAFT_IVF_NPROBE", "3")
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_HASHES", "32")
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_BANDS", "8")
    c = cfg.from_env()
    assert (c.lsh_planes, c.ivf_cent_stride, c.ivf_nprobe) == (8, 101, 3)
    assert (c.minhash_hashes, c.minhash_bands) == (32, 8)


def test_from_env_defaults(monkeypatch):
    for v in (
        "SPARK_GRAFT_LSH_PLANES",
        "SPARK_GRAFT_IVF_CENT_STRIDE",
        "SPARK_GRAFT_IVF_NPROBE",
        "SPARK_GRAFT_MINHASH_HASHES",
        "SPARK_GRAFT_MINHASH_BANDS",
    ):
        monkeypatch.delenv(v, raising=False)
    assert cfg.from_env() == cfg.EngineConfig()


def test_invalid_config_rejected(monkeypatch):
    with pytest.raises(ValueError):
        cfg.EngineConfig(minhash_hashes=16, minhash_bands=5)
    monkeypatch.setenv("SPARK_GRAFT_LSH_PLANES", "zero")
    with pytest.raises(ValueError):
        cfg.from_env()
    monkeypatch.setenv("SPARK_GRAFT_LSH_PLANES", "-2")
    with pytest.raises(ValueError):
        cfg.from_env()


def test_ann_nondefault_planes_matches_oracle(spark, ddb, sf_dir):
    """6 hyperplanes (64 buckets) instead of the default 4: the Spark plan
    and the regenerated oracle SQL must still agree bit-for-bit."""
    assert similarity.N_PLANES != 6, "pick a non-default plane count"
    sdf = similarity.llm_similarity_ann(spark, sf_dir, n_planes=6)
    duck = ddb.execute(similarity.ann_oracle_sql(n_planes=6)).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_similarity_ann[planes=6]")


def test_embedding_lsh_nondefault_planes_matches_oracle(spark, ddb, sf_dir):
    assert similarity.N_PLANES != 5
    sdf = dedup.llm_dedup_embedding_lsh(spark, sf_dir, n_planes=5)
    duck = ddb.execute(dedup._embedding_lsh_sql(n_planes=5)).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_dedup_embedding_lsh[planes=5]")


def test_cdc_nondefault_knobs_match_oracle(spark, ddb, sf_dir):
    """16-char window / divisor 16 instead of 8/32: different boundary
    set and chunk sizes, same differential-parity requirement."""
    from pipelinejobs_indexer_spark.tables import load_table

    assert (dedup.CDC_WINDOW, dedup.CDC_DIVISOR) != (16, 16)
    docs = load_table(spark, sf_dir, "documents")
    sdf = dedup.cdc_duplicate_chunks(docs, window=16, divisor=16)
    duck = ddb.execute(dedup._cdc_sql(window=16, divisor=16)).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_dedup_cdc[16/16]")


def test_minhash_nondefault_bands_matches_oracle(spark, ddb, sf_dir):
    """8 hashes x 2 bands (r=4 rows/band) instead of 16x4: a different
    S-curve, same differential-parity requirement."""
    assert (dedup.N_MINHASH, dedup.N_BANDS) != (8, 2)
    sdf = dedup.llm_dedup_minhash(spark, sf_dir, n_minhash=8, n_bands=2)
    duck = ddb.execute(dedup._minhash_pairs_sql(n_minhash=8, n_bands=2)).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_dedup_minhash[8x2]")


def test_resilient_checkpoint_env_parsing(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RESILIENT_CHECKPOINTS", "1")
    assert cfg.from_env().resilient_checkpoints is True
    monkeypatch.setenv("SPARK_GRAFT_RESILIENT_CHECKPOINTS", "false")
    assert cfg.from_env().resilient_checkpoints is False
    monkeypatch.delenv("SPARK_GRAFT_RESILIENT_CHECKPOINTS")
    assert cfg.from_env().resilient_checkpoints is False
    monkeypatch.setenv("SPARK_GRAFT_RESILIENT_CHECKPOINTS", "maybe")
    with pytest.raises(ValueError):
        cfg.from_env()


def test_resilient_checkpoints_identical_results(spark, sf_dir, monkeypatch):
    """VERDICT r4 item 2: the CC loop and BPE trainer must produce
    IDENTICAL output whether lineage cuts are executor-local
    (localCheckpoint, the local-mode default) or reliable checkpoint()s
    to a checkpoint dir (the cluster/resilience path) — the flag changes
    durability, never semantics."""
    import dataclasses

    from pipelinejobs_indexer_spark.llm.dedup import llm_dedup_clusters
    from pipelinejobs_indexer_spark.llm.text import llm_bpe_train

    def run_both(fn):
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, resilient_checkpoints=False)
        )
        base = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, resilient_checkpoints=True)
        )
        resilient = sorted(map(tuple, fn(spark, sf_dir).collect()))
        return base, resilient

    cc_base, cc_res = run_both(llm_dedup_clusters)
    assert cc_base == cc_res and len(cc_base) > 0
    bpe_base, bpe_res = run_both(llm_bpe_train)
    assert bpe_base == bpe_res and len(bpe_base) > 0
    # the resilient path must actually have set a checkpoint dir
    assert spark.sparkContext.getCheckpointDir() is not None


def test_module_constants_track_the_active_config():
    """similarity/dedup capture CONFIG at import; if someone edits a
    default in one place only, the captured constants and the config
    must not silently diverge."""
    from pipelinejobs_indexer_spark.config import CONFIG
    from pipelinejobs_indexer_spark.llm import dedup, similarity

    assert similarity.N_PLANES == CONFIG.lsh_planes
    assert similarity.CENT_STRIDE == CONFIG.ivf_cent_stride
    assert similarity.N_PROBE == CONFIG.ivf_nprobe
    assert dedup.N_MINHASH == CONFIG.minhash_hashes
    assert dedup.N_BANDS == CONFIG.minhash_bands
    assert dedup.CDC_WINDOW == CONFIG.cdc_window
    assert dedup.CDC_DIVISOR == CONFIG.cdc_divisor
