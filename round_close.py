#!/usr/bin/env python
"""Round-close checklist (VERDICT r9 task 8): one command that
regenerates the per-round evidence artifacts and REFUSES to declare
the round closeable while the scale-accounting gate is red with
banked-but-uninstalled journal progress — the failure mode that
shipped a red gate two rounds running (r8: polluted artifact; r9:
resumed run killed by the round clock with 75 entries banked but the
stale artifact still committed).

    python round_close.py 10        # the round number

Steps (each prints PASS/FAIL; exit 1 on the first refusal):

1. scale-accounting gate (tests/test_docs_scale_sync.py).  If RED and
   BENCH_SCALE_journal.jsonl holds entries absent from the committed
   BENCH_SCALE.json, the fix is machine time, not a waiver: finish the
   resumed `SPARK_GRAFT_SCALE1000=1 python bench_scale.py`, install
   the emitted line as BENCH_SCALE.json, run update_parity_md().
2. full-surface correctness artifact: drive_full.py at sf0.01 →
   CORRECTNESS_full_r{N:02d}.json (exit 1 on any query failure).
3. bench.py on the idle machine (its own load sentinel refuses under
   load) — the printed JSON line is the round's headline number; the
   driver records its own BENCH_r{N}.json, this step proves the
   emission works at HEAD.
4. full pytest suite.
5. git cleanliness: uncommitted changes listed (the driver commits
   leftovers, but a deliberate commit beats a sweep).

Run it with the machine otherwise idle (step 3 refuses if not).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))


def run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print(f"\n== {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=ROOT, **kw)


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python round_close.py <round-number>")
    n = int(sys.argv[1])

    # -- 1. scale-accounting gate, with the journal-progress refusal --
    gate = run(
        [sys.executable, "-m", "pytest", "tests/test_docs_scale_sync.py", "-q"]
    )
    if gate.returncode != 0:
        # Only entries the CURRENT harness would replay count as
        # pending: records banked under a bumped-away JOURNAL_EPOCH,
        # or for (section, query) pairs since demoted out of a
        # section, are dead weight — counting them would emit the
        # "finish the resumed run" refusal for a red gate whose cause
        # is something else entirely (ADVICE r10).
        sys.path.insert(0, ROOT)
        import bench_scale

        registered: set[tuple[str, str]] = (
            {("scale10", q) for q in bench_scale.QUERIES}
            | {("scale100", q) for q in bench_scale.SCALE100_QUERIES}
            | {("scale1000", q) for q in bench_scale.SCALE1000_QUERIES}
        )
        journal = os.path.join(ROOT, "BENCH_SCALE_journal.jsonl")
        banked: set[tuple[str, str]] = set()
        if os.path.exists(journal):
            with open(journal) as fh:
                for ln in fh:
                    try:
                        rec = json.loads(ln)
                    except ValueError:
                        continue
                    if rec.get("rev") != bench_scale.JOURNAL_EPOCH:
                        continue
                    if (rec["section"], rec["name"]) not in registered:
                        continue
                    banked.add((rec["section"], rec["name"]))
        installed: set[tuple[str, str]] = set()
        bs = os.path.join(ROOT, "BENCH_SCALE.json")
        if os.path.exists(bs):
            data = json.load(open(bs))
            installed |= {("scale10", q) for q in data.get("queries", {})}
            installed |= {("scale100", q) for q in data.get("scale100", {})}
            installed |= {("scale1000", q) for q in data.get("scale1000", {})}
        pending = banked - installed
        if pending:
            sys.exit(
                f"REFUSED: the scale gate is red and {len(pending)} "
                "journaled measurements are not in the committed "
                "BENCH_SCALE.json — finish the resumed bench_scale run "
                "(SPARK_GRAFT_SCALE1000=1 python bench_scale.py), "
                "install its emitted {\"metric\" line as BENCH_SCALE.json "
                'and run python -c "import bench_scale; '
                'bench_scale.update_parity_md()" — do NOT close the '
                "round around it."
            )
        sys.exit("REFUSED: scale gate red (and no pending journal — "
                 "investigate, never hand-patch the artifact).")
    print("gate: PASS")

    # -- 2. full-surface correctness artifact ------------------------
    art = f"CORRECTNESS_full_r{n:02d}.json"
    if run(
        [sys.executable, "drive_full.py", "/root/testdata/sf0.01", art]
    ).returncode != 0:
        sys.exit(f"REFUSED: drive_full failed — fix before closing ({art})")
    print(f"correctness: PASS ({art})")

    # -- 3. bench emission (self-sentineled) -------------------------
    if run([sys.executable, "bench.py"]).returncode != 0:
        sys.exit("REFUSED: bench.py failed or refused under load")
    print("bench: PASS")

    # -- 4. full suite ------------------------------------------------
    if run([sys.executable, "-m", "pytest", "tests/", "-x", "-q"]).returncode != 0:
        sys.exit("REFUSED: test suite red")
    print("pytest: PASS")

    # -- 5. git cleanliness -------------------------------------------
    st = subprocess.run(
        ["git", "status", "--porcelain"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    if st:
        print("\nuncommitted changes (commit them deliberately):\n" + st)
    else:
        print("git: clean")
    print("\nround-close: ALL GREEN")


if __name__ == "__main__":
    main()
