"""Incremental cross-corpus dedup: the committed-state log, the
cross-corpus flag pass, crash-replay semantics, and the curate
composition."""

import pytest


BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy log near the river bend at "
        "dawn light")
NEAR = BASE.replace("dawn light", "dusk glow")  # ~0.9 shingle Jaccard
OTHER = ("completely unrelated content about stellar nucleosynthesis "
         "inside collapsing supernova cores producing heavy elements "
         "through rapid neutron capture processes during the explosion")
THIRD = ("an entirely different third document discussing the economics "
         "of medieval wool trading routes between flanders and florence "
         "with extensive commentary on guild regulations and tariffs")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_two_increments_cross_corpus(spark, tmp_path):
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, cross_corpus_flags, dedup_increment,
    )

    log = DedupLog(spark, str(tmp_path / "state"))
    p = MinHashParams()

    # increment A: one exact-dup pair (1,2) + one unique
    a = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    assert dedup_increment(a, log, "run-a", params=p, threshold=0.35)
    assert log.committed_runs() == ["run-a"]
    corpus = {r["doc_id"] for r in log.read("corpus").collect()}
    assert corpus == {1, 3}  # within-batch exact rep kept doc 1

    # increment B: 10=exact dup of committed BASE, 11=near dup of
    # committed BASE, 12=exact dup WITHIN B of 13, 14=genuinely new
    b = _docs(spark, [(10, BASE), (11, NEAR), (12, THIRD), (13, THIRD),
                      (14, "fresh short text nothing like the others at all "
                           "with plenty of brand new words in this row")])
    flags = {
        r["doc_id"]: r
        for r in cross_corpus_flags(
            b, log, p, threshold=0.35, id_col="doc_id"
        ).collect()
    }
    assert flags[10]["exact_cross"] and not flags[10]["kept"]
    assert flags[11]["near_cross"] and not flags[11]["kept"]
    assert flags[12]["is_rep"] and flags[12]["kept"]
    assert not flags[13]["is_rep"] and not flags[13]["kept"]
    assert flags[14]["kept"] and not flags[14]["exact_cross"]

    assert dedup_increment(b, log, "run-b", params=p, threshold=0.35)
    corpus = {r["doc_id"] for r in log.read("corpus").collect()}
    assert corpus == {1, 3, 12, 14}
    # state components cover exactly the committed corpus
    assert {int(r["id"]) for r in log.read("fingerprints").collect()} \
        == corpus
    # replay of a committed run is a strict no-op
    assert not dedup_increment(b, log, "run-b", params=p, threshold=0.35)
    assert {r["doc_id"] for r in log.read("corpus").collect()} == corpus


def test_within_batch_near_dedup(spark, tmp_path):
    """Near-duplicates arriving in the SAME increment dedup exactly as
    if they had arrived in separate increments — the corpus must not
    depend on how docs were batched."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment,
    )

    p = MinHashParams()

    # one batch: BASE and its near-dup together
    log1 = DedupLog(spark, str(tmp_path / "one"))
    assert dedup_increment(
        _docs(spark, [(1, BASE), (2, NEAR), (3, OTHER)]),
        log1, "run-a", params=p, threshold=0.35,
    )
    together = {r["doc_id"] for r in log1.read("corpus").collect()}

    # two batches: BASE committed first, near-dup arrives later
    log2 = DedupLog(spark, str(tmp_path / "two"))
    assert dedup_increment(_docs(spark, [(1, BASE), (3, OTHER)]),
                           log2, "run-a", params=p, threshold=0.35)
    assert dedup_increment(_docs(spark, [(2, NEAR)]),
                           log2, "run-b", params=p, threshold=0.35)
    split = {r["doc_id"] for r in log2.read("corpus").collect()}

    assert together == split == {1, 3}  # min-id survivor either way


def test_crash_replay_exactly_once(spark, tmp_path):
    """Crash between the increment write and the manifest commit: the
    increment is invisible, the retry commits it exactly once, and no
    doc is deduped twice or missed."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment,
    )

    root = str(tmp_path / "state")
    log = DedupLog(spark, root)
    p = MinHashParams()
    a = _docs(spark, [(1, BASE), (2, OTHER)])
    assert dedup_increment(a, log, "run-a", params=p, threshold=0.35)

    # crash during run-b's commit: poison the manifest write so the
    # increment dir lands but the manifest never does
    b = _docs(spark, [(10, NEAR), (11, THIRD)])
    real_write = log.fs.write_bytes

    def _boom(path, data):
        raise OSError("simulated crash before manifest create")

    log.fs.write_bytes = _boom
    with pytest.raises(OSError):
        dedup_increment(b, log, "run-b", params=p, threshold=0.35)
    log.fs.write_bytes = real_write

    # nothing committed; a fresh reader sees only run-a
    fresh = DedupLog(spark, root)
    assert fresh.committed_runs() == ["run-a"]
    assert {r["doc_id"] for r in fresh.read("corpus").collect()} == {1, 2}

    # retry commits exactly once: 10 (near-dup of committed BASE) is
    # still dropped, 11 still kept — same verdicts as an uncrashed run
    assert dedup_increment(b, fresh, "run-b", params=p, threshold=0.35)
    assert {r["doc_id"] for r in fresh.read("corpus").collect()} == {1, 2, 11}
    assert not dedup_increment(b, fresh, "run-b", params=p, threshold=0.35)
    assert {r["doc_id"] for r in fresh.read("corpus").collect()} == {1, 2, 11}


def test_compact_folds_increments(spark, tmp_path):
    """Compaction folds N live increment dirs into one with identical
    state, keeps the run-id ledger (absorbed run_ids still replay as
    no-ops), and later increments dedup against the compacted state
    exactly as against the original."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment,
    )

    log = DedupLog(spark, str(tmp_path / "state"))
    p = MinHashParams()
    assert dedup_increment(_docs(spark, [(1, BASE)]), log, "run-a",
                           params=p, threshold=0.35)
    assert dedup_increment(_docs(spark, [(2, OTHER)]), log, "run-b",
                           params=p, threshold=0.35)
    assert dedup_increment(_docs(spark, [(3, THIRD)]), log, "run-c",
                           params=p, threshold=0.35)
    assert len(log.live_increments()) == 3
    before = {
        c: {tuple(r) for r in log.read(c).collect()}
        for c in ("corpus", "fingerprints", "signatures", "bands")
    }

    assert log.compact(target_partitions=1)
    assert len(log.live_increments()) == 1
    assert log.live_increments()[0].startswith("compact-")
    after = {
        c: {tuple(r) for r in log.read(c).collect()}
        for c in ("corpus", "fingerprints", "signatures", "bands")
    }
    assert before == after  # byte-equal state, one directory

    # the ledger survives: every absorbed run_id still replays no-op
    assert set(log.committed_runs()) >= {"run-a", "run-b", "run-c"}
    assert not dedup_increment(_docs(spark, [(9, THIRD)]), log, "run-b",
                               params=p, threshold=0.35)

    # cross-corpus verdicts are unchanged by compaction: exact dup of
    # committed BASE drops, near-dup drops, fresh doc lands
    assert dedup_increment(
        _docs(spark, [(10, BASE), (11, NEAR),
                      (12, "wholly new words never seen before in any "
                           "committed document of this little corpus")]),
        log, "run-d", params=p, threshold=0.35,
    )
    assert {r["doc_id"] for r in log.read("corpus").collect()} \
        == {1, 2, 3, 12}

    # nothing to fold after a fresh compact + one increment → compact
    # again folds 2 → 1; a single-increment log refuses
    assert log.compact()
    assert not log.compact()


def test_dedup_log_time_travel(spark, tmp_path):
    """Snapshot retention: the last keep_manifests manifests are
    readable by seq (corpus-as-of-increment-N), older ones expire with
    their now-unreferenced directories; compaction-absorbed dirs stay
    readable until the manifests naming them age out."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment,
    )

    root = str(tmp_path / "state")
    log = DedupLog(spark, root, keep_manifests=2)
    p = MinHashParams()
    for run, doc in (("run-a", (1, BASE)), ("run-b", (2, OTHER)),
                     ("run-c", (3, THIRD))):
        assert dedup_increment(_docs(spark, [doc]), log, run,
                               params=p, threshold=0.35)

    seqs = [s["seq"] for s in log.snapshots()]
    assert seqs == [2, 3]  # window of 2: seq 1 expired
    assert {r["doc_id"] for r in log.read("corpus", seq=2).collect()} \
        == {1, 2}
    assert {r["doc_id"] for r in log.read("corpus", seq=3).collect()} \
        == {1, 2, 3}
    with pytest.raises(LookupError, match="retained"):
        log.read("corpus", seq=1)

    # compaction: the pre-compaction snapshot stays time-travelable
    # (its absorbed dirs are still referenced by a retained manifest)
    assert log.compact()
    assert {r["doc_id"] for r in log.read("corpus", seq=3).collect()} \
        == {1, 2, 3}
    assert {r["doc_id"] for r in log.read("corpus").collect()} \
        == {1, 2, 3}

    # one more commit ages the pre-compaction manifest out; the
    # absorbed dirs are swept with it, the compacted state lives on
    assert dedup_increment(_docs(spark, [(4, "a wholly new document "
                                             "with fresh vocabulary "
                                             "throughout")]),
                           log, "run-d", params=p, threshold=0.35)
    with pytest.raises(LookupError):
        log.read("corpus", seq=3)
    import os
    assert sorted(os.listdir(f"{root}/_increments")) == sorted(
        [log.live_increments()[0], "run-d"]
    )
    assert {r["doc_id"] for r in log.read("corpus").collect()} \
        == {1, 2, 3, 4}


def test_compact_crash_is_invisible(spark, tmp_path):
    """A crash during compaction's manifest create leaves the previous
    snapshot fully intact; the retry succeeds."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment,
    )

    root = str(tmp_path / "state")
    log = DedupLog(spark, root)
    p = MinHashParams()
    assert dedup_increment(_docs(spark, [(1, BASE)]), log, "run-a",
                           params=p, threshold=0.35)
    assert dedup_increment(_docs(spark, [(2, OTHER)]), log, "run-b",
                           params=p, threshold=0.35)

    real_write = log.fs.write_bytes

    def _boom(path, data):
        raise OSError("simulated crash before compaction manifest")

    log.fs.write_bytes = _boom
    with pytest.raises(OSError):
        log.compact()
    log.fs.write_bytes = real_write

    fresh = DedupLog(spark, root)
    assert fresh.live_increments() == ["run-a", "run-b"]
    assert {r["doc_id"] for r in fresh.read("corpus").collect()} == {1, 2}
    assert fresh.compact()
    assert {r["doc_id"] for r in fresh.read("corpus").collect()} == {1, 2}


def test_family_mismatch_refused(spark, tmp_path):
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, dedup_increment, state_frames,
    )

    log = DedupLog(spark, str(tmp_path / "state"))
    xx = MinHashParams()
    a = _docs(spark, [(1, BASE)])
    assert dedup_increment(a, log, "run-a", params=xx, threshold=0.35)
    # an explicit commit with a different family must be refused …
    md5 = MinHashParams(family="md5", n_perm=32, bands=8)
    with pytest.raises(ValueError, match="committed under"):
        log.commit_increment(
            "run-x", state_frames(_docs(spark, [(9, THIRD)]), md5), md5
        )
    # … while dedup_increment silently adopts the log's family
    assert dedup_increment(
        _docs(spark, [(9, THIRD)]), log, "run-c", params=md5, threshold=0.35
    )
    assert log.params() == xx


def test_cross_corpus_flags_params_guard(spark, tmp_path):
    """Reading the state with a different signature family must raise:
    mismatched band keys would silently never match and every
    cross-corpus duplicate would report kept=True."""
    from mindocr_spark.dedup_state import (
        DedupLog, MinHashParams, cross_corpus_flags, dedup_increment,
    )

    log = DedupLog(spark, str(tmp_path / "state"))
    assert dedup_increment(_docs(spark, [(1, BASE)]), log, "run-a",
                           params=MinHashParams(), threshold=0.35)
    with pytest.raises(ValueError, match="committed under"):
        cross_corpus_flags(
            _docs(spark, [(2, NEAR)]), log,
            MinHashParams(family="md5", n_perm=32, bands=8),
            threshold=0.35, id_col="doc_id",
        )


def test_curate_increment_end_to_end(spark, tmp_path):
    """Full composition: raw pages → curate → cross-corpus dedup →
    committed log, two increments, idempotent replay."""
    from mindocr_spark.corpus import pages_dataframe
    from mindocr_spark.curate import CurateConfig
    from mindocr_spark.dedup_state import DedupLog, curate_increment

    log = DedupLog(spark, str(tmp_path / "state"))
    cfg = CurateConfig(min_chars=100, neardup_threshold=2.0)
    a = pages_dataframe(spark, 20, seed=3)
    assert curate_increment(a, log, "inc-1", cfg=cfg, threshold=0.35)
    n1 = log.read("corpus").count()
    assert n1 > 0

    # second increment overlaps the first (same seed ⇒ same pages for
    # the first 20) plus 10 new pages: only the new survivors land
    b = pages_dataframe(spark, 30, seed=3)
    assert curate_increment(b, log, "inc-2", cfg=cfg, threshold=0.35)
    n2 = log.read("corpus").count()
    assert n2 > n1
    committed_urls = [r["url"] for r in log.read("corpus").collect()]
    assert len(committed_urls) == len(set(committed_urls))  # no doc twice

    assert not curate_increment(b, log, "inc-2", cfg=cfg)  # replay no-op
    assert log.read("corpus").count() == n2
