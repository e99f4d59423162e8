"""The bench artifact's self-adjudication machinery — pure-Python, no
Spark: prior-round lookup from committed BENCH_r{N}.json files and the
outlier-suspect selection that drives post-sweep re-measurement. The
measurement loop itself is exercised by the driver every round; these
tests pin the adjudication DECISIONS (what gets re-run, against which
baseline) so a phantom outlier cannot silently reach `queries` and a
missing/malformed artifact cannot crash the sweep."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_prior_round_times_reads_latest_committed_bench():
    prior = bench._prior_round_times()
    # the repo carries BENCH_r01..r07; the latest with queries wins
    assert prior, "expected a committed prior BENCH artifact"
    here = os.path.dirname(os.path.abspath(bench.__file__))
    latest = max(
        int(fn[7:-5])
        for fn in os.listdir(here)
        if fn.startswith("BENCH_r") and fn.endswith(".json")
    )
    with open(os.path.join(here, f"BENCH_r{latest:02d}.json")) as fh:
        doc = json.load(fh)
    want = doc.get("queries") or doc["parsed"]["queries"]
    assert prior == {k: float(v) for k, v in want.items()}
    # every headline query that existed last round has a baseline
    assert sum(1 for n in bench.HEADLINE if n in prior) >= 40


def test_outlier_suspects_selection():
    prior = {"a": 1.0, "b": 2.0, "c": 0.5, "z": 1.0}
    timings = {
        "a": 1.2,  # fine
        "b": 5.01,  # 2.5x exceeded
        "c": 10.0,  # 20x — worst, must rank first
        "new_query": 99.0,  # no baseline → never a suspect
    }
    assert bench._outlier_suspects(timings, prior) == ["c", "b"]
    # boundary: exactly 2.5x is NOT a suspect (strict >)
    assert bench._outlier_suspects({"a": 2.5}, {"a": 1.0}) == []
    # cap: worst RERUN_CAP ratios only
    many_t = {f"q{i}": float(10 + i) for i in range(20)}
    many_p = {f"q{i}": 1.0 for i in range(20)}
    got = bench._outlier_suspects(many_t, many_p)
    assert len(got) == bench.RERUN_CAP
    assert got[0] == "q19"  # worst ratio first
    # zero/absent priors never divide
    assert bench._outlier_suspects({"a": 9.0}, {"a": 0.0}) == []
    assert bench._outlier_suspects({"a": 9.0}, {}) == []
