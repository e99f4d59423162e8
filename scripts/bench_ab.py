"""Isolated A/B bench adjudication between two git trees.

Round 12's sweep landed under ~2× external host load and needed a
MANUAL min-of-3 re-measure against the round-11 git tree to prove the
wide movers were host noise, not code regressions (SCALE.md "Round-12
bench adjudication"). This script makes that adjudication mechanical
and artifact-born:

    python scripts/bench_ab.py --ref <old-tree-ref> [--queries a,b,c]
        [--sf-dir DIR] [--reps 3] [out.json]

For each query it measures an isolated min-of-N on BOTH trees — the
current working tree in-process caller's job; this script measures the
REF tree by materializing it with ``git worktree add`` and running a
fresh-session subprocess inside it — and emits one JSON document with
both numbers and the ratio. ``bench.py`` imports :func:`measure_ref`
to embed the block into ``BENCH_DETAIL_r{N}.json`` automatically
whenever the sweep's movers exceed the noise band, so a VERDICT reader
gets the regression-vs-noise answer from the artifact alone.

The REF subprocess runs the ref's OWN registry (its plans/operators as
committed), warmed up the same way bench.py warms up, against the same
SF dir — the exact protocol of the round-12 manual adjudication.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time

sys.path.insert(0, os.environ["AB_TREE"])
queries = json.loads(os.environ["AB_QUERIES"])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reps = int(os.environ.get("AB_REPS", "3"))

from gmall_flink_parent_spark.session import get_spark
from gmall_flink_parent_spark import plans

spark = get_spark("bench-ab")
spark.sparkContext.setLogLevel("ERROR")
qmap = plans.query_map()
# same warmup as bench.py: JVM/codegen on the smallest SF
qmap["pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
    "noop"
).mode("overwrite").save()
out = {}
for name in queries:
    fn = qmap.get(name)
    if fn is None:
        out[name] = None  # query does not exist in this tree
        continue
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
"""


def measure_ref(
    ref: str, queries: list[str], sf_dir: str, reps: int = 3, timeout: int = 1800
) -> dict[str, float | None]:
    """min-of-``reps`` per query, measured on git tree ``ref`` in an
    isolated fresh-session subprocess. Returns {query: sec | None}
    (None = query absent in that tree). Raises on git/subprocess
    failure — callers embedding into artifacts should catch."""
    tree = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", "--detach", tree, ref],
        check=True,
        capture_output=True,
    )
    try:
        env = {
            **os.environ,
            "AB_TREE": tree,
            "AB_QUERIES": json.dumps(queries),
            "AB_REPS": str(reps),
            "SPARK_GRAFT_SF_DIR": sf_dir,
        }
        proc = subprocess.run(
            [sys.executable, "-c", _RUNNER],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=tree,
        )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"ref runner produced no result (rc={proc.returncode}): "
            f"{proc.stderr[-800:]}"
        )
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", tree],
            capture_output=True,
        )


def measure_worktree(
    queries: list[str], sf_dir: str, reps: int = 3, timeout: int = 1800
) -> dict[str, float | None]:
    """Same protocol for the CURRENT working tree (fresh subprocess, so
    both sides of the A/B see identical session conditions)."""
    tree = REPO
    env = {
        **os.environ,
        "AB_TREE": tree,
        "AB_QUERIES": json.dumps(queries),
        "AB_REPS": str(reps),
        "SPARK_GRAFT_SF_DIR": sf_dir,
    }
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=tree,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"worktree runner produced no result (rc={proc.returncode}): "
        f"{proc.stderr[-800:]}"
    )


# the paths whose content defines "the engine's code" for the
# self-comparison guard below (docs/artifacts excluded on purpose: the
# stamp commit adds artifacts without touching these)
_CODE_PATHS = ("gmall_flink_parent_spark", "__spark_entry__.py", "bench.py")


def prior_round_ref(here: str = REPO) -> tuple[str | None, str]:
    """Resolve the PRIOR round's final tree: the commit that landed the
    newest ``BENCH_r{N}.json`` whose code differs from the current
    working tree.

    Returns ``(sha_or_None, note)`` — the note says which artifact the
    ref came from, or why none resolved (recorded verbatim in the ab
    block so adjudication never disappears silently; round-13 advisor
    finding).

    The differs-from-working-tree guard closes the self-comparison
    hazard: if the CURRENT round's closing stamp has already committed
    its own BENCH_r{N}.json when bench runs, the newest artifact's
    landing commit contains the current code and an A/B against it
    compares the tree to itself (ratio ~1 regardless of real
    regressions). Such a candidate is skipped in favor of the next
    round back. A candidate whose CODE genuinely didn't change between
    rounds is skipped too — harmless, since an A/B of identical code
    carries no information."""
    import re

    rounds = sorted(
        (
            int(m.group(1))
            for fn in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", fn))
        ),
        reverse=True,
    )
    if not rounds:
        return None, "no BENCH_r{N}.json artifact on disk"
    for rnum in rounds:
        target = f"BENCH_r{rnum:02d}.json"
        proc = subprocess.run(
            ["git", "-C", here, "log", "-1", "--format=%H", "--", target],
            capture_output=True,
            text=True,
        )
        sha = proc.stdout.strip()
        if not sha:
            continue  # artifact untracked: its round never closed in git
        same = subprocess.run(
            ["git", "-C", here, "diff", "--quiet", sha, "--", *_CODE_PATHS],
            capture_output=True,
        )
        if same.returncode == 0:
            # identical code → self-comparison; try the round before
            continue
        return sha, f"commit landing {target}"
    return None, (
        "every committed BENCH_r{N}.json landing commit matches the "
        "current working tree's code — no distinct prior tree to A/B"
    )


def ab_block(
    queries: list[str], ref: str, sf_dir: str, reps: int = 3
) -> dict:
    """The machine-generated adjudication table: both trees measured
    under the same isolated protocol, ratio per query."""
    old = measure_ref(ref, queries, sf_dir, reps=reps)
    new = measure_worktree(queries, sf_dir, reps=reps)
    try:
        la = round(os.getloadavg()[0], 1)
    except OSError:
        la = -1.0
    rows = {}
    for q in queries:
        o, n = old.get(q), new.get(q)
        rows[q] = {
            "ref_sec": o,
            "worktree_sec": n,
            "ratio": round(n / o, 2) if o and n else None,
        }
    return {
        "metric": "bench_ab",
        "ref": ref,
        "sf_dir": sf_dir,
        "reps": reps,
        "loadavg": la,
        "queries": rows,
    }


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None, help="old tree ref (default: prior round)")
    ap.add_argument("--queries", default=None, help="comma-separated query names")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("out", nargs="?", default=None)
    args = ap.parse_args()

    if args.ref:
        ref = args.ref
    else:
        ref, note = prior_round_ref()
        if ref is None:
            print(f"ref unresolved ({note}); pass --ref", file=sys.stderr)
            return 2
        print(f"ref {ref[:12]} ({note})", file=sys.stderr)
    if args.queries:
        queries = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        # default: widest movers of the current BENCH_DETAIL vs its
        # prior-round counterpart
        import re

        here = REPO
        with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
            cur = json.load(fh)["queries"]
        rounds = sorted(
            int(m.group(1))
            for fn in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_DETAIL_r(\d+)\.json", fn))
        )
        prior: dict[str, float] = {}
        if len(rounds) >= 2:
            with open(os.path.join(here, f"BENCH_DETAIL_r{rounds[-2]:02d}.json")) as fh:
                prior = json.load(fh)["queries"]
        movers = sorted(
            (
                (cur[q] / prior[q], q)
                for q in cur
                if q in prior and prior[q] > 0 and cur[q] > 1.3 * prior[q]
            ),
            reverse=True,
        )
        queries = [q for _, q in movers[:6]]
        if not queries:
            print("no movers above 1.3x prior; nothing to adjudicate")
            return 0
    doc = ab_block(queries, ref, args.sf_dir, reps=args.reps)
    line = json.dumps(doc, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
