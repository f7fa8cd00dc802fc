"""Mechanical end-of-round artifact regeneration (round-3 hygiene
item: the SELFCHECK artifact must postdate the LAST code commit, not
precede a late rewrite).

Runs, in order:
  1. the full oracle self-check at sf0.01 -> SELFCHECK_<tag>.json
  2. the full physical-plan audit (exit status folded into the JSON)
  3. the sf0.1 LOOP-FAMILY value gate -> SELFCHECK_<tag>_sf01.json:
     every ``*_dist`` twin + ``incremental_*_epoch2`` +
     ``hyperball_orders_b6`` re-hashed at sf0.1 (r5 routine, VERDICT
     r4 next-round 3 — the round-4 CC bug class was correct at sf0.01
     and silently wrong at sf0.1 because iteration budgets scale with
     diameter; toy-SF hashing cannot see it)
and then verifies the artifact's mtime is newer than the repo's last
commit, printing a one-line verdict. Run this AFTER the final code
commit of the round; commit the artifacts it writes.

Usage: python tools/finalize_round.py r04 [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "rX"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    art = os.path.join(REPO, f"SELFCHECK_{tag}.json")

    rc1 = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         f"--json={art}", sf_dir]
    )
    rc2 = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py"), sf_dir]
    )

    # sf0.1 loop-family gate: the queries whose correctness depends on
    # iteration budgets / graph diameter (the scale-dependent bug class)
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    slice_keys = [
        k
        for k in entry.queries()
        if k.endswith("_dist")
        or k.startswith("incremental_")
        or k == "hyperball_orders_b6"
    ]
    art01 = os.path.join(REPO, f"SELFCHECK_{tag}_sf01.json")
    rc3 = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         f"--json={art01}", "/root/testdata/sf0.1", *slice_keys]
    )

    last_commit = int(
        subprocess.check_output(
            ["git", "-C", REPO, "log", "-1", "--format=%ct"]
        ).strip()
    )
    fresh = os.path.getmtime(art) > last_commit
    # fold the audit verdict into the artifact so the round record is
    # one file
    with open(art) as f:
        data = json.load(f)
    data["_meta"] = {
        "plan_audit_violations": rc2,
        "selfcheck_exit": rc1,
        "sf01_slice_exit": rc3,
        "sf01_slice_n": len(slice_keys),
        "fresher_than_last_commit": bool(fresh),
        "sf_dir": sf_dir,
    }
    with open(art, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(
        f"finalize {tag}: selfcheck_exit={rc1} plan_audit_exit={rc2} "
        f"sf01_slice_exit={rc3} ({len(slice_keys)} queries) "
        f"artifact_fresh={fresh}"
    )
    return 0 if (rc1 == 0 and rc2 == 0 and rc3 == 0 and fresh) else 1


if __name__ == "__main__":
    raise SystemExit(main())
