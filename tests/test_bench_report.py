"""Unit tests for bench.py's scaling-report renderers — the artifact the
north-rule scaling evidence (BENCH/BASELINE.md) is generated from.

No SparkSession: these exercise pure parsing/formatting over synthetic
BENCH/cluster_samples.jsonl records, so a template or estimator change
that would corrupt the published evidence fails here in milliseconds.
"""
import json
import os

import pytest

import bench


@pytest.fixture
def fake_repo(tmp_path, monkeypatch):
    """Point bench.REPO at a temp dir with a synthetic samples file."""
    (tmp_path / "BENCH").mkdir()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return tmp_path


def _write_samples(repo, records):
    with open(repo / "BENCH" / "cluster_samples.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


TWO_FAMILIES = [
    # 2-core family: eff = (400/100)/4 = 1.0 exactly on the min walls
    {"rep": 0, "workers": 1, "exec_cores": 2, "docs": 100, "walls": [400.0, 440.0]},
    {"rep": 0, "workers": 4, "exec_cores": 2, "docs": 100, "walls": [100.0, 130.0]},
    # 4-core family: eff = (200/80)/4 = 0.625
    {"rep": 0, "workers": 1, "exec_cores": 4, "docs": 100, "walls": [200.0]},
    {"rep": 0, "workers": 4, "exec_cores": 4, "docs": 100, "walls": [80.0]},
    # per-family calibration records (written by cluster_run.py)
    {"calibration": {"intcpu": {"rates": {"2": 1.0, "8": 4.0}, "eff": 1.0},
                     "membw": {"rates": {"2": 1.0, "8": 2.0}, "eff": 0.5}},
     "exec_cores": 2},
    # non-sample lines must be ignored, not crash the parse
    {"note": "unrelated record"},
]


def test_cluster_family_effs_groups_by_executor_size(fake_repo):
    _write_samples(fake_repo, TWO_FAMILIES)
    effs = bench._cluster_family_effs()
    assert effs == [(2, 1, 4, 1.0), (4, 1, 4, 0.625)]


def test_cluster_family_effs_uses_min_wall_per_level(fake_repo):
    # walls for the same (family, workers) accumulate across reps; the
    # estimator is min-per-level, same as the local protocol
    recs = [
        {"workers": 1, "exec_cores": 2, "docs": 1, "walls": [500.0]},
        {"workers": 1, "exec_cores": 2, "docs": 1, "walls": [400.0]},
        {"workers": 4, "exec_cores": 2, "docs": 1, "walls": [125.0]},
        {"workers": 4, "exec_cores": 2, "docs": 1, "walls": [160.0]},
    ]
    _write_samples(fake_repo, recs)
    assert bench._cluster_family_effs() == [(2, 1, 4, 0.8)]


def test_cluster_family_effs_skips_single_level_family(fake_repo):
    # an in-flight probe has only the lo level so far — no ratio to report
    _write_samples(fake_repo, [
        {"workers": 1, "exec_cores": 8, "docs": 1, "walls": [300.0]},
        {"workers": 1, "exec_cores": 2, "docs": 1, "walls": [400.0]},
        {"workers": 4, "exec_cores": 2, "docs": 1, "walls": [100.0]},
    ])
    assert bench._cluster_family_effs() == [(2, 1, 4, 1.0)]


def test_cluster_family_effs_missing_file(fake_repo):
    assert bench._cluster_family_effs() == []


def test_cluster_md_renders_each_family_with_calibration(fake_repo):
    _write_samples(fake_repo, TWO_FAMILIES)
    md = bench._cluster_md()
    assert "### 2-core executors: 1 vs 4" in md
    assert "### 4-core executors: 1 vs 4" in md
    assert "1.000** (target ≥ 0.8)" in md
    assert "0.625** (target ≥ 0.8)" in md
    # the 2-core family carries its same-box calibration line; the 4-core
    # family has no calibration record and must render without one
    assert "(2→8 pinned cores): intcpu eff 1.0, membw eff 0.5" in md
    assert "(4→16 pinned cores)" not in md
    # raw walls are published verbatim, not just the min
    assert "[400.0, 440.0]" in md
    # throughput at both levels — the baseline metric is docs/sec/executor
    # (100 docs / 400 s / 1 exec = 0.2; 100 / 100 s / 4 = 0.2)
    assert "| 1 executor(s) × 2 cores | 400.00 | 0.2 | 0.2 |" in md
    assert "| 4 executor(s) × 2 cores | 100.00 | 1.0 | 0.2 |" in md


def test_cluster_paired_md_pairs_consecutive_sessions():
    # file order: lo, hi, lo, hi — two weather-paired sessions; effs 1.0, 0.5
    # (ec=3 is a family with no backfill sidecar entry, so the real repo's
    # BENCH/cluster_commit_backfill.json cannot leak into the test)
    ordered = [(1, 400.0, None), (4, 100.0, None),
               (1, 400.0, None), (4, 200.0, None)]
    md = bench._cluster_paired_md(ordered, 1, 4, 3)
    assert "| 0 | 400.0 | 100.0 | 1.000 | — |" in md
    assert "| 1 | 400.0 | 200.0 | 0.500 | — |" in md
    assert "median paired efficiency: **0.750**" in md
    assert "quietest-window session: **1.000**" in md


def test_cluster_paired_md_skips_unpaired_and_single_pair():
    # hi,lo pair (hi-first session) + trailing unmatched hi → one pair → no
    # table (a single pair renders nothing; the headline already covers it)
    assert bench._cluster_paired_md(
        [(4, 100.0, None), (1, 400.0, None), (4, 100.0, None)], 1, 4, 3) == ""
    # a trailing in-flight lo session is ignored, the two complete pairs render
    ordered = [(1, 400.0, None), (4, 100.0, None),
               (1, 480.0, None), (4, 150.0, None), (1, 500.0, None)]
    md = bench._cluster_paired_md(ordered, 1, 4, 3)
    assert "| 0 | 400.0 | 100.0 | 1.000 |" in md
    assert "| 1 | 480.0 | 150.0 | 0.800 |" in md
    assert "| 2 |" not in md


def test_cluster_paired_md_pairs_hi_first_sessions():
    # SPARK_GRAFT_HI_FIRST sessions write the hi row before the lo row;
    # the pairing is order-agnostic, and a mixed file (one lo-first session,
    # one hi-first session) yields the same two weather-paired measurements
    ordered = [(1, 400.0, None), (4, 100.0, None),   # lo-first session
               (4, 200.0, None), (1, 400.0, None)]   # hi-first session
    md = bench._cluster_paired_md(ordered, 1, 4, 3)
    assert "| 0 | 400.0 | 100.0 | 1.000 | — |" in md
    assert "| 1 | 400.0 | 200.0 | 0.500 | — |" in md
    assert "median paired efficiency: **0.750**" in md


def test_cluster_paired_md_groups_by_engine_version():
    # two pre-instrumentation sessions (no commit) and two at the current
    # code version: the all-sessions median blends binaries; the per-version
    # line reports the current binary alone. "abc1234" resolves through git
    # rev-parse to nothing (not a real commit) and falls back to itself.
    ordered = [(1, 400.0, None), (4, 200.0, None),   # eff 0.5
               (1, 400.0, None), (4, 160.0, None),   # eff 0.625
               (1, 320.0, "abc1234"), (4, 90.0, "abc1234"),   # eff 0.889
               (1, 330.0, "abc1234"), (4, 97.0, "abc1234")]   # eff 0.851
    md = bench._cluster_paired_md(ordered, 1, 4, 3)
    assert "| 2 | 320.0 | 90.0 | 0.889 | `abc1234` |" in md
    assert "median paired efficiency: **0.738**" in md
    assert ("current-engine (tree `abc1234`) median: **0.870** over 2 "
            "sessions") in md
    # a single session at the newest commit adds no per-version median line
    md_one = bench._cluster_paired_md(ordered[:6], 1, 4, 3)
    assert "current-engine" not in md_one


def test_engine_version_resolves_package_tree_hash():
    # a real repo commit maps to the micro_lab_ocr_spark/ tree hash, so
    # bench/doc/sample commits that don't touch the package share a version
    import subprocess
    head = subprocess.run(
        ["git", "-C", bench.REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()
    tree = subprocess.run(
        ["git", "-C", bench.REPO, "rev-parse", "--short",
         "HEAD:micro_lab_ocr_spark"],
        capture_output=True, text=True).stdout.strip()
    if head and tree:
        assert bench._engine_version(head) == tree
    # unknown commits fall back to themselves, never raise
    assert bench._engine_version("nonexistent0") == "nonexistent0"
    assert bench._engine_version(None) is None


def test_cluster_paired_md_backfill_sidecar(fake_repo):
    # rows recorded before commit stamping get their engine version from the
    # sidecar (keyed by family, then paired-session index), rendered with an
    # asterisked evidence footnote and grouped with same-version sessions
    with open(fake_repo / "BENCH" / "cluster_commit_backfill.json", "w") as f:
        json.dump({"2": {"0": {"engine_tree": "t1234ab",
                               "evidence": "rows first committed in X"}}}, f)
    ordered = [(1, 400.0, None), (4, 110.0, None),          # backfilled 0.909
               (1, 400.0, "deadbee"), (4, 120.0, "deadbee")]  # recorded 0.833
    # make the recorded commit resolve to the SAME tree as the backfill
    bench._ENGINE_VER_CACHE["deadbee"] = "t1234ab"
    md = bench._cluster_paired_md(ordered, 1, 4, 2)
    assert "| 0 | 400.0 | 110.0 | 0.909 | `t1234ab`\\* |" in md
    assert "| 1 | 400.0 | 120.0 | 0.833 | `deadbee` |" in md
    assert "rows first committed in X" in md
    assert ("current-engine (tree `t1234ab`) median: **0.871** over 2 "
            "sessions") in md
    # a family with no sidecar entry renders no footnote
    md3 = bench._cluster_paired_md(ordered, 1, 4, 3)
    assert "backfilled from git history" not in md3


def test_cluster_md_includes_paired_table_with_two_reps(fake_repo):
    recs = [
        {"workers": 1, "exec_cores": 2, "docs": 100, "walls": [400.0]},
        {"workers": 4, "exec_cores": 2, "docs": 100, "walls": [100.0]},
        {"workers": 1, "exec_cores": 2, "docs": 100, "walls": [480.0]},
        {"workers": 4, "exec_cores": 2, "docs": 100, "walls": [150.0]},
    ]
    _write_samples(fake_repo, recs)
    md = bench._cluster_md()
    assert "Per-session pairing" in md
    assert "median paired efficiency: **0.900**" in md
    # headline stays the cross-session min estimator: (400/100)/4 = 1.0
    assert "1.000** (target ≥ 0.8)" in md


def test_cluster_samples_skip_underprovisioned_rows(fake_repo):
    # a wall measured with fewer executors than requested is not a sample of
    # the claimed level — it must not reach the published tables
    recs = [
        {"workers": 1, "exec_cores": 2, "docs": 100, "walls": [400.0],
         "executors_requested": 1, "executors_seen": 1},
        {"workers": 4, "exec_cores": 2, "docs": 100, "walls": [500.0],
         "executors_requested": 4, "executors_seen": 2},  # under-provisioned
        {"workers": 4, "exec_cores": 2, "docs": 100, "walls": [125.0],
         "executors_requested": 4, "executors_seen": 4},
    ]
    _write_samples(fake_repo, recs)
    assert bench._cluster_family_effs() == [(2, 1, 4, 0.8)]
    assert "500.0" not in bench._cluster_md()


def test_paired_eff_md_stops_at_rep_mismatch():
    # a killed half-rep must not let later reps pair across host regimes:
    # rep 1's hi is missing, so pairing stops after rep 0 → under 2 pairs
    groups = {4: [(0, 400.0), (1, 410.0), (2, 420.0)],
              16: [(0, 100.0), (2, 105.0)]}
    assert bench._paired_eff_md(4, 16, groups) == ""
    # aligned rep ids render one row per rep with the true-division ratio
    groups = {4: [(0, 400.0), (1, 480.0)], 16: [(0, 100.0), (1, 150.0)]}
    md = bench._paired_eff_md(4, 16, groups)
    assert "| 0 | 400.0 | 100.0 | 1.000 |" in md
    assert "| 1 | 480.0 | 150.0 | 0.800 |" in md
    assert "median paired efficiency: 0.900" in md


def test_cluster_md_empty_without_samples(fake_repo):
    assert bench._cluster_md() == ""
    _write_samples(fake_repo, [{"note": "no walls yet"}])
    assert bench._cluster_md() == ""


def test_headline_marks_target(fake_repo):
    _write_samples(fake_repo, TWO_FAMILIES)
    cal = {"intcpu": {"eff": 0.9}, "membw": {"eff": 0.5}}
    md = bench._headline_md(0.714, cal, ceiling_eff=0.75)
    # one line per true-cluster family, pass/fail marked against >= 0.8
    assert "1→4 executors × 2 cores" in md and "MEETS the ≥ 0.8 target" in md
    assert "1→4 executors × 4 cores" in md and "below target" in md
    # local stand-in line carries the blended-ceiling ratio (0.714/0.75)
    assert "**0.714**" in md and "0.95× the blended hardware ceiling" in md


def test_headline_without_ceiling_or_samples(fake_repo):
    # no cluster samples and no computed ceiling: the local line must still
    # render (no ratio clause), not divide by zero
    cal = {"intcpu": {"eff": 0.9}, "membw": {"eff": 0.5}}
    md = bench._headline_md(0.5, cal, ceiling_eff=0.0)
    assert "**0.500**" in md
    assert "blended hardware ceiling" not in md
