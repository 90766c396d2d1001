"""Commit-log scale + crash-safety: the exactly-once guard must stay exact
through 10^5 epochs, gaps, repeated compaction, and crashes that land in the
middle of a compaction's delete phase."""

from __future__ import annotations

import os

from etl_documentos_spark.streaming.commitlog import CommitLog

GAPS = {31_337, 64_001, 64_002, 99_990}


def test_commitlog_100k_epochs_bounded_and_exact(tmp_path):
    """10^5 committed epochs (with gaps) fold to a bounded file count and
    keep is_committed / max_offsets exact. The driver-side cost of restart
    (max_offsets) stays O(keep_last), not O(total epochs)."""
    log = CommitLog(str(tmp_path / "c"))
    n = 100_000
    for e in range(n):
        if e in GAPS:
            continue
        log.commit(e, f"fp{e}", {0: e * 2, 1: e * 2 + 1})

    rolled = log.compact_log(keep_last=256)
    # contiguous prefix 0..31336 rolled; the FIRST gap stops the roll-up
    # (an uncommitted id must never be claimed committed), so the tail
    # after it stays as files — commit the gap epochs and a second
    # compaction folds the rest through
    assert rolled == 31_337
    log.commit(31_337, "fp-late", {0: 0})
    for g in sorted(GAPS - {31_337}):
        log.commit(g, "fp-late", {0: 0})
    log.compact_log(keep_last=256)
    files = [f for f in os.listdir(log.root) if f.startswith("commit-")]
    assert len(files) <= 256 + len(GAPS)

    for e in (0, 1, 31_336, 31_338, 50_000, n - 1):
        assert log.is_committed(e), e
    assert not log.is_committed(n)
    assert not log.is_committed(n + 12345)
    off = log.max_offsets()
    assert off[0] == (n - 1) * 2 and off[1] == (n - 1) * 2 + 1


def test_commitlog_crash_mid_compaction_recovers(tmp_path, monkeypatch):
    """A crash after the HWM rewrite but partway through the per-epoch file
    deletes must not corrupt the log: the HWM already covers the rolled
    range durably (deletes happen strictly after the HWM replace), so every
    epoch still reads committed, and the next compaction finishes the
    cleanup."""
    log = CommitLog(str(tmp_path / "c"))
    n = 2_000
    for e in range(n):
        log.commit(e, f"fp{e}", {0: e})

    real_remove = os.remove
    calls = {"n": 0}

    def flaky_remove(path):
        calls["n"] += 1
        if calls["n"] == 100:
            raise OSError("simulated crash mid-delete")
        real_remove(path)

    monkeypatch.setattr(os, "remove", flaky_remove)
    try:
        log.compact_log(keep_last=64)
    except OSError:
        pass
    monkeypatch.setattr(os, "remove", real_remove)

    # invariants hold in the crashed state
    for e in range(0, n, 97):
        assert log.is_committed(e), e
    assert log.max_offsets() == {0: n - 1}

    # recovery compaction completes the fold and bounds the file count
    log.compact_log(keep_last=64)
    for e in range(0, n, 97):
        assert log.is_committed(e), e
    files = [f for f in os.listdir(log.root) if f.startswith("commit-")]
    assert len(files) <= 64
    assert log.max_offsets() == {0: n - 1}
