#!/usr/bin/env python3
"""Mechanized bench-drift A/B (VERDICT r11 #3).

Every round that refreshes the full-suite bench record compares it to the
previous committed BENCH_LOCAL.json. When the shared-query ratio exceeds
the threshold, the r5/r9/r11 adjudications all had to REBUILD the same
experiment by hand: check out the previous round's code in a worktree and
re-run the most-inflated queries under both commits back-to-back on the
same box, because only per-query deltas that reproduce under BOTH trees
are code regressions — uniform inflation across untouched queries is
machine state. This tool runs that experiment and writes the record
(BENCH_AB_r<N>.json) so the next judge reads an artifact instead of prose.

Usage: tools/bench_ab.py <round> [--prev REF] [--threshold 1.10]
                         [--top 10] [--force]

- Reads the working-tree BENCH_LOCAL.json as the CURRENT record and the
  previous committed version (last commit touching the file before the
  current content) as the PREVIOUS record.
- If the shared-subset ratio <= threshold AND no single shared query
  exceeds 2x its previous record (with a 1 s floor — r12's q67 at 2.67x
  hid under an aggregate 1.053): writes a small not-triggered record and
  exits 0 (use --force to run the A/B anyway).
- Else: `git worktree add` the previous ref, sbt-compile it, and run the
  top-N most-inflated shared queries as a subset bench (which never
  overwrites BENCH_LOCAL.json) under BOTH trees back-to-back. The verdict
  is mechanical: ab_ratio (cur-tree subset total / prev-tree subset
  total) near 1.0 with both trees inflated vs the old record = box drift;
  ab_ratio tracking the record ratio = code regression.

Serialize with other sbt runs — two sbt processes fight over the
target-dir lock (the tool runs its two benches strictly in sequence).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, cwd=REPO, check=True, capture=True):
    return subprocess.run(args, cwd=cwd, check=check,
                          capture_output=capture, text=True)


def load_queries(text, label):
    try:
        rec = json.loads(text)
        return {k: float(v) for k, v in rec["queries"].items()}
    except (json.JSONDecodeError, KeyError, TypeError) as e:
        sys.exit(f"bench_ab: cannot parse {label}: {e}")


def subset_bench(tree, names, cpus, sf_dir, log_path):
    """Run the SPARK_GRAFT_BENCH_ONLY subset bench in `tree`; return the
    full (untruncated) per-query map from stdout."""
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_SF_DIR=sf_dir)
    with open(log_path, "w") as log:
        rc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                            cwd=tree, env=env, stdout=log,
                            stderr=subprocess.STDOUT).returncode
    if rc != 0:
        sys.exit(f"bench_ab: bench in {tree} failed rc={rc} (log: {log_path})")
    full_line = None
    with open(log_path) as log:
        for line in log:
            line = line.strip()
            if line.startswith('{"metric":"total"') and '"truncated"' not in line:
                full_line = line
    if full_line is None:
        sys.exit(f"bench_ab: no bench summary line in {log_path}")
    return load_queries(full_line, log_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--prev", default=None,
                    help="git ref of the previous record (default: auto)")
    ap.add_argument("--threshold", type=float, default=1.10)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    out_path = os.path.join(REPO, f"BENCH_AB_r{args.round}.json")

    cur_path = os.path.join(REPO, "BENCH_LOCAL.json")
    if not os.path.exists(cur_path):
        sys.exit("bench_ab: no BENCH_LOCAL.json in the working tree")
    with open(cur_path) as f:
        cur = load_queries(f.read(), "BENCH_LOCAL.json")

    # Previous record: if the working copy is dirty (a fresh re-run not yet
    # committed), HEAD's version IS the previous epoch; otherwise take the
    # commit before the one that introduced the current content.
    if args.prev:
        prev_ref = args.prev
    else:
        # Compare against HEAD (not the index): round_close stages the fresh
        # record before invoking this tool, and a staged-but-uncommitted
        # record must still count as the NEW epoch with HEAD as previous
        # (ADVICE r12: index-diff read a staged record as clean and slid
        # prev_ref one epoch too far back).
        dirty = sh(["git", "diff", "--quiet", "HEAD", "--", "BENCH_LOCAL.json"],
                   check=False).returncode != 0
        touches = sh(["git", "log", "--format=%H", "-n", "2", "--",
                      "BENCH_LOCAL.json"]).stdout.split()
        if not touches:
            sys.exit("bench_ab: BENCH_LOCAL.json has no committed history")
        if dirty:
            prev_ref = touches[0]
        elif len(touches) > 1:
            prev_ref = touches[1]
        else:
            sys.exit("bench_ab: only one committed BENCH_LOCAL.json epoch; "
                     "pass --prev explicitly")
    prev_txt = sh(["git", "show", f"{prev_ref}:BENCH_LOCAL.json"]).stdout
    prev = load_queries(prev_txt, f"{prev_ref}:BENCH_LOCAL.json")

    shared = sorted(set(cur) & set(prev))
    if not shared:
        sys.exit("bench_ab: no shared queries between the two records")
    cur_tot = sum(cur[q] for q in shared)
    prev_tot = sum(prev[q] for q in shared)
    record_ratio = cur_tot / prev_tot
    # Per-query trigger (VERDICT r12 #3): a single query at >2x its previous
    # record hides inside an aggregate ratio — r12's q67 sat at 2.67x under
    # an untriggered 1.053. Any shared query above PERQ_RATIO with at least
    # PERQ_FLOOR seconds in the current record forces the A/B, regardless of
    # the aggregate. The floor keeps sub-second noise (fixed Spark overhead
    # dominates there) from spamming worktree runs.
    PERQ_RATIO, PERQ_FLOOR = 2.0, 1.0
    perq_hits = sorted(
        (q for q in shared
         if cur[q] >= PERQ_FLOOR and cur[q] / prev[q] > PERQ_RATIO),
        key=lambda q: cur[q] / prev[q], reverse=True)
    base = {
        "round": args.round, "prev_ref": prev_ref,
        "threshold": args.threshold, "n_shared": len(shared),
        "perq_ratio": PERQ_RATIO, "perq_floor_sec": PERQ_FLOOR,
        "perq_hits": {q: round(cur[q] / prev[q], 3) for q in perq_hits},
        "record_prev_total": round(prev_tot, 3),
        "record_cur_total": round(cur_tot, 3),
        "record_ratio": round(record_ratio, 4),
    }
    if record_ratio <= args.threshold and not perq_hits and not args.force:
        base["triggered"] = False
        with open(out_path, "w") as f:
            json.dump(base, f, indent=1)
        print(f"bench_ab: ratio {record_ratio:.3f} <= {args.threshold}, "
              f"no per-query >{PERQ_RATIO}x hit — wrote {out_path}")
        return

    # A/B subset: every per-query hit, then the most-inflated remainder up
    # to --top total, so the record always adjudicates the exact outliers
    # that forced the run.
    by_inflation = sorted(shared, key=lambda q: cur[q] / prev[q], reverse=True)
    top = list(perq_hits) + [q for q in by_inflation if q not in perq_hits]
    top = top[:max(args.top, len(perq_hits))]
    why = (f"ratio {record_ratio:.3f} > {args.threshold}"
           if record_ratio > args.threshold else
           f"per-query hits: {','.join(perq_hits)}" if perq_hits else "--force")
    print(f"bench_ab: triggered ({why}); A/B on: " + ",".join(top))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wt = f"/tmp/bench_ab_r{args.round}_prev"
    if os.path.exists(wt):
        sh(["git", "worktree", "remove", "--force", wt], check=False)
        shutil.rmtree(wt, ignore_errors=True)
    sh(["git", "worktree", "add", "--detach", wt, prev_ref])
    try:
        # Strictly sequential: two sbt processes deadlock on the target lock.
        prev_run = subset_bench(wt, top, cpus, sf_dir,
                                f"/tmp/bench_ab_r{args.round}_prev.log")
        cur_run = subset_bench(REPO, top, cpus, sf_dir,
                               f"/tmp/bench_ab_r{args.round}_cur.log")
    finally:
        sh(["git", "worktree", "remove", "--force", wt], check=False)
    prev_sub = sum(prev_run[q] for q in top)
    cur_sub = sum(cur_run[q] for q in top)
    rec_sub_prev = sum(prev[q] for q in top)
    ab_ratio = cur_sub / prev_sub
    base.update({
        "triggered": True, "subset": top,
        "record_subset_prev_total": round(rec_sub_prev, 3),
        "ab_prev_tree": {q: round(prev_run[q], 3) for q in top},
        "ab_cur_tree": {q: round(cur_run[q], 3) for q in top},
        "ab_prev_total": round(prev_sub, 3),
        "ab_cur_total": round(cur_sub, 3),
        "ab_ratio": round(ab_ratio, 4),
        # Mechanical verdict: the current code measured against the
        # previous CODE on today's box. Near-1.0 (or faster) while both
        # trees run hot vs the old record = the box drifted, not the code.
        "verdict": ("env-drift" if ab_ratio <= 1.05 else
                    "code-regression" if ab_ratio >= 1.10 else
                    "inconclusive"),
    })
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"bench_ab: ab_ratio {ab_ratio:.3f} "
          f"(prev-tree {prev_sub:.1f}s, cur-tree {cur_sub:.1f}s, old record "
          f"{rec_sub_prev:.1f}s) -> {base['verdict']} — wrote {out_path}")


if __name__ == "__main__":
    main()
