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


def test_embedding_lsh_multi_table_matches_oracle(spark, ddb, sf_dir):
    """Round 7: the AND-OR amplified construction (lsh_tables > 1) —
    disjoint plane families per table, namespaced probe keys, one
    spanning equi-join — must agree with the regenerated oracle
    bit-for-bit, just like every other knob override."""
    from pipelinejobs_indexer_spark.config import CONFIG

    assert (CONFIG.lsh_planes, CONFIG.lsh_tables) != (5, 3)
    sdf = dedup.llm_dedup_embedding_lsh(spark, sf_dir, n_planes=5, n_tables=3)
    duck = ddb.execute(dedup._embedding_lsh_sql(n_planes=5, n_tables=3)).df()
    assert_frames_match(
        sdf.toPandas(), duck, "llm_dedup_embedding_lsh[planes=5,tables=3]"
    )


def test_embedding_lsh_tables_only_add_candidates(spark, sf_dir):
    """Table 0 IS the single-table construction, and extra tables union
    in candidates, so the pair set at tables=T must contain the pair set
    at tables=1 (same planes) — the recall-monotonicity the AND-OR
    amplification exists for. Also pins default-config identity: the
    registered query (CONFIG tables=1) equals an explicit tables=1 run."""
    one = {
        (r.vec_a, r.vec_b)
        for r in dedup.llm_dedup_embedding_lsh(
            spark, sf_dir, n_planes=5, n_tables=1
        ).collect()
    }
    three = {
        (r.vec_a, r.vec_b)
        for r in dedup.llm_dedup_embedding_lsh(
            spark, sf_dir, n_planes=5, n_tables=3
        ).collect()
    }
    assert one <= three
    default = {
        (r.vec_a, r.vec_b)
        for r in dedup.llm_dedup_embedding_lsh(spark, sf_dir).collect()
    }
    explicit = {
        (r.vec_a, r.vec_b)
        for r in dedup.llm_dedup_embedding_lsh(spark, sf_dir, n_tables=1).collect()
    }
    assert default == explicit


def test_lsh_tables_knob_validation(monkeypatch):
    """lsh_tables parses from SPARK_GRAFT_LSH_TABLES and rejects values
    outside [1, 64]."""
    monkeypatch.setenv("SPARK_GRAFT_LSH_TABLES", "8")
    assert cfg.from_env().lsh_tables == 8
    for bad in ("0", "65"):
        monkeypatch.setenv("SPARK_GRAFT_LSH_TABLES", bad)
        with pytest.raises(ValueError, match="(?i)lsh_tables"):
            cfg.from_env()


def test_cdc_nondefault_knobs_match_oracle(spark, ddb, sf_dir):
    """16-char window / divisor 16 instead of 8/32: different boundary
    set and chunk sizes, same differential-parity requirement."""
    from pipelinejobs_indexer_spark.tables import load_table

    assert (dedup.CDC_WINDOW, dedup.CDC_DIVISOR) != (16, 16)
    docs = load_table(spark, sf_dir, "documents")
    sdf = dedup.cdc_duplicate_chunks(docs, window=16, divisor=16)
    duck = ddb.execute(dedup._cdc_sql(window=16, divisor=16)).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_dedup_cdc[16/16]")


def test_cdc_nondefault_hash_matches_oracle(spark, ddb, sf_dir):
    """Both boundary rules stay oracle-verified whatever the default:
    gear is the default since r7 (VERDICT r6 item 2), so md5 is now the
    non-default rule — a different boundary SET, a distinct chunking
    decision the oracle must replay; plus a non-default gear
    window/divisor combination (the original VERDICT r5 item 4
    coverage)."""
    from pipelinejobs_indexer_spark.tables import load_table

    assert dedup.CDC_HASH == "gear", "gear is the shipped default"
    assert dedup.CDC_TWIN_HASH == "md5", "twin must carry the alternate rule"
    docs = load_table(spark, sf_dir, "documents")
    sdf = dedup.cdc_duplicate_chunks(docs, hash_kind="md5")
    duck = ddb.execute(dedup._cdc_sql(hash_kind="md5")).df()
    assert_frames_match(sdf.toPandas(), duck, "llm_dedup_cdc[md5]")
    sdf2 = dedup.cdc_duplicate_chunks(docs, window=12, divisor=16, hash_kind="gear")
    duck2 = ddb.execute(dedup._cdc_sql(12, 16, "gear")).df()
    assert_frames_match(sdf2.toPandas(), duck2, "llm_dedup_cdc[gear 12/16]")


def test_cdc_gear_unicode_codepoint_parity(spark):
    """The gear table is indexed by codepoint % 256: Spark ascii() and
    DuckDB ord() must agree on NON-ASCII text too (both return the full
    Unicode codepoint; char-based substr/length on both sides). Planted
    multibyte docs — accented latin, CJK, emoji — through both engines
    at a small divisor so boundaries actually fire inside the unicode
    runs."""
    import duckdb
    import pandas as pd

    from pipelinejobs_indexer_spark.llm import dedup

    rows = [
        (1, "héllo wörld çafé niño déjà vu déjà vu héllo wörld çafé"),
        (2, "日本語のテキスト処理 日本語のテキスト処理 データ重複排除"),
        (3, "mixed ascii und ümlaut text 😀😀 mixed ascii und ümlaut text"),
        (4, "héllo wörld çafé niño PREFIX déjà vu déjà vu héllo wörld çafé"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    try:
        for kind in ("gear", "md5"):
            got = dedup.cdc_duplicate_chunks(docs, window=4, divisor=8, hash_kind=kind)
            want = con.execute(dedup._cdc_sql(4, 8, kind)).df()
            assert_frames_match(got.toPandas(), want, f"llm_dedup_cdc[{kind} unicode]")
    finally:
        con.close()


def test_cdc_invalid_overrides_error_loudly():
    """An explicit invalid knob (0 window/divisor, unknown hash, gear
    window beyond the signed-64 bound) ERRORS instead of silently using
    the default (ADVICE r5: the old `x or DEFAULT` pattern swallowed 0)."""
    for kwargs in (
        {"window": 0},
        {"divisor": 0},
        {"window": -3},
        {"hash_kind": "sha1"},
        {"window": 25, "hash_kind": "gear"},
    ):
        with pytest.raises(ValueError):
            dedup._cdc_params(
                kwargs.get("window"), kwargs.get("divisor"), kwargs.get("hash_kind")
            )
    with pytest.raises(ValueError):
        cfg.EngineConfig(cdc_hash="sha1")
    with pytest.raises(ValueError):
        cfg.EngineConfig(cdc_hash="gear", cdc_window=25)


def test_cdc_hash_and_contam_cap_env_parsing(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CDC_HASH", "gear")
    monkeypatch.setenv("SPARK_GRAFT_CONTAM_DF_CAP", "128")
    c = cfg.from_env()
    assert (c.cdc_hash, c.contam_df_cap) == ("gear", 128)
    monkeypatch.setenv("SPARK_GRAFT_CC_MIN_STRATEGY", "twophase")
    assert cfg.from_env().cc_min_strategy == "twophase"
    monkeypatch.delenv("SPARK_GRAFT_CC_MIN_STRATEGY")
    monkeypatch.setenv("SPARK_GRAFT_CDC_HASH", "crc32")
    with pytest.raises(ValueError):
        cfg.from_env()
    monkeypatch.delenv("SPARK_GRAFT_CDC_HASH")
    monkeypatch.setenv("SPARK_GRAFT_CONTAM_DF_CAP", "0")
    with pytest.raises(ValueError):
        cfg.from_env()


def test_exact_embedding_baseline_row_cap(spark, sf_dir, monkeypatch):
    """VERDICT r6 item 6: the exact all-pairs embedding baseline is a
    registered O(n²) theta join — fine as the LSH primary's ground
    truth at fixture scale, a cartesian time bomb on a real corpus. It
    must refuse loudly above the configured row ceiling (naming the LSH
    primary and the escape knob) and keep working below it."""
    import dataclasses

    from pipelinejobs_indexer_spark.llm.dedup import llm_dedup_embedding

    monkeypatch.setattr(
        cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, exact_pairs_max_rows=10)
    )
    with pytest.raises(ValueError, match="llm_dedup_embedding_lsh"):
        llm_dedup_embedding(spark, sf_dir)
    monkeypatch.setattr(
        cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, exact_pairs_max_rows=50_000)
    )
    assert llm_dedup_embedding(spark, sf_dir).count() > 0
    # env knob parses like every other positive-int knob
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIRS_MAX_ROWS", "123")
    assert cfg.from_env().exact_pairs_max_rows == 123
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIRS_MAX_ROWS", "0")
    with pytest.raises(ValueError):
        cfg.from_env()


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


def test_state_store_env_parsing(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    assert cfg.from_env().state_store == "rocksdb"
    monkeypatch.delenv("SPARK_GRAFT_STATE_STORE")
    assert cfg.from_env().state_store == "hdfs"
    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "leveldb")
    with pytest.raises(ValueError):
        cfg.from_env()
    with pytest.raises(ValueError):
        cfg.EngineConfig(state_store="leveldb")


def test_state_store_backend_identical_results(spark, sf_dir, monkeypatch):
    """VERDICT r6 item 5: the stateful streaming operators must produce
    IDENTICAL results on the in-heap HDFS-backed store (local default)
    and on RocksDB (SPARK_GRAFT_STATE_STORE=rocksdb — the 100 TB
    setting, where per-key state spills off-heap/on-disk with
    incremental checkpoints). The knob changes state placement and
    durability, never semantics — the resilient_checkpoints pattern.
    Covers the applyInPandasWithState FSM + dead-letter paths and the
    dropDuplicates state path."""
    import dataclasses

    from pipelinejobs_indexer_spark.streaming.queries import (
        stream_dead_letter,
        stream_fsm_state,
        stream_ingest_dedupe,
    )

    def run_both(fn):
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, state_store="hdfs")
        )
        base = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, state_store="rocksdb")
        )
        rocks = sorted(map(tuple, fn(spark, sf_dir).collect()))
        return base, rocks

    fsm_base, fsm_rocks = run_both(stream_fsm_state)
    assert fsm_base == fsm_rocks and len(fsm_base) > 0
    dd_base, dd_rocks = run_both(stream_ingest_dedupe)
    assert dd_base == dd_rocks and len(dd_base) > 0
    dl_base, dl_rocks = run_both(stream_dead_letter)
    assert dl_base == dl_rocks
    # the replay must restore the session's provider conf afterwards
    key = "spark.sql.streaming.stateStore.providerClass"
    assert "RocksDB" not in spark.conf.get(key, "HDFSBacked")


def test_registry_loads_under_md5_mode_wide_cdc_window():
    """Round-6 review regression, updated for the r7 gear default:
    SPARK_GRAFT_CDC_WINDOW=32 is only valid PAIRED with cdc_hash=md5
    (gear's <=24 signed-64 ceiling now bounds the default config and
    the validation error must say how to escape it). Under that md5
    config the gear-side twin used to raise at registry.load_all()
    resolving its oracle, killing all 146 queries; the twin clamps its
    window to the gear ceiling, so the whole registry must load. Run in
    subprocesses so the env overrides reach the import-time config
    capture."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # wide window alone: the gear default must refuse it, loudly and early
    bad = subprocess.run(
        [sys.executable, "-c", "import pipelinejobs_indexer_spark.config as c"],
        env=dict(os.environ, SPARK_GRAFT_CDC_WINDOW="32"),
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert bad.returncode != 0
    assert "SPARK_GRAFT_CDC_HASH=md5" in bad.stderr

    env = dict(os.environ, SPARK_GRAFT_CDC_WINDOW="32", SPARK_GRAFT_CDC_HASH="md5")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pipelinejobs_indexer_spark import registry;"
            "registry.load_all();"
            "assert len(registry.QUERIES) == len(registry.ORACLE) >= 146;"
            "from pipelinejobs_indexer_spark.llm import dedup;"
            "assert (dedup.CDC_TWIN_HASH, dedup.CDC_TWIN_WINDOW) == ('gear', 24);"
            "print('LOADED', len(registry.QUERIES))",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LOADED" in out.stdout


def test_cc_min_strategy_parity(spark, sf_dir, monkeypatch):
    """VERDICT r5 item 7: the two-phase (combiner groupBy + join-back)
    neighborhood min must produce IDENTICAL clusters to the default
    window min — on the registered minhash-cluster query AND on a
    planted power-law star+chain graph (the hub shape the escape hatch
    exists for). The knob changes the exchange structure, never the
    answer."""
    import dataclasses

    from pipelinejobs_indexer_spark.llm.dedup import (
        connected_components,
        llm_dedup_clusters,
    )

    hub_edges = [(0, v) for v in range(1, 301)]           # 300-degree hub
    chain = [(v, v + 1) for v in range(500, 540)]          # diameter stress
    pairs = spark.createDataFrame(
        [{"doc_a": a, "doc_b": b} for a, b in hub_edges + chain]
    )

    def run_both(fn):
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, cc_min_strategy="window")
        )
        w = sorted(map(tuple, fn().collect()))
        monkeypatch.setattr(
            cfg, "CONFIG", dataclasses.replace(cfg.CONFIG, cc_min_strategy="twophase")
        )
        t = sorted(map(tuple, fn().collect()))
        return w, t

    w, t = run_both(lambda: connected_components(pairs))
    assert w == t and len(w) == 342  # 301 star + 41 chain vertices
    star = {r for r in w if r[1] == 0}
    assert len(star) == 301  # the hub component collapses to min=0
    w2, t2 = run_both(lambda: llm_dedup_clusters(spark, sf_dir))
    assert w2 == t2 and len(w2) > 0


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
    assert dedup.CDC_HASH == CONFIG.cdc_hash
    assert dedup.CONTAM_DF_CAP == CONFIG.contam_df_cap


def test_registry_loads_under_extreme_trainer_knobs():
    """The trainer oracles are config-derived SQL generated at
    registry.load_all() (the r6 twin lesson: every lazily-rendered
    oracle must resolve under EVERY valid config, not just the default).
    At the knob ceilings (k=64, 50 unrolled iterations each) the
    generators emit their largest SQL — the registry must still load,
    and the rendered oracles must carry the expected iteration count."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_KMEANS_K="64",
        SPARK_GRAFT_KMEANS_ITERS="50",
        SPARK_GRAFT_LOGREG_ITERS="50",
        SPARK_GRAFT_PQ_M="8",
        SPARK_GRAFT_PQ_K="64",
        SPARK_GRAFT_PQ_ITERS="50",
    )
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pipelinejobs_indexer_spark import registry;"
            "registry.load_all();"
            "assert len(registry.QUERIES) == len(registry.ORACLE) >= 150;"
            "km = registry.ORACLE['llm_embedding_kmeans'];"
            "lg = registry.ORACLE['llm_classifier_logreg'];"
            "assert 'c50' in km and 'c51' not in km;"
            "assert 'w50' in lg and 'w51' not in lg;"
            "pq = registry.ORACLE['llm_embedding_pq'];"
            "assert 'c50x7' in pq and 'c51x7' not in pq and 'em8' not in pq;"
            "print('LOADED', len(registry.QUERIES))",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LOADED" in out.stdout


def test_registry_loads_under_lsh_tables_ceiling():
    """Same lazily-rendered-oracle lesson for the round-7 lsh_tables
    knob: at the ceiling (64 tables x the default 4 planes = 256 bucket
    sign-projections, each over 64 literal weights) the embedding-LSH
    oracle is its largest — the registry must still load and the
    rendered SQL must carry exactly the configured table count."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_LSH_TABLES="64")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from pipelinejobs_indexer_spark import registry;"
            "registry.load_all();"
            "assert len(registry.QUERIES) == len(registry.ORACLE) >= 150;"
            "sql = registry.ORACLE['llm_dedup_embedding_lsh'];"
            "assert ' AS b63' in sql and ' AS b64' not in sql;"
            "print('LOADED', len(registry.QUERIES))",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LOADED" in out.stdout
