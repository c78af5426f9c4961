"""Regenerate the committed full-battery artifact.

Runs tools/driver_check.py over the ENTIRE queries() registry at the
given sf dir (default sf0.01, the driver's correctness scale), parses
its PASS/FAIL/ok lines, and writes CORRECTNESS_full_r{N}.json in the
shape the round-3 VERDICT asked to see committed each round: per-query
{status, mode, rows, detail} plus a summary stamped with the git head
the run was taken at.

Usage: python tools/full_battery.py [sf_dir] [out_path]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_full_r4.json"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "driver_check.py"), sf_dir],
        capture_output=True,
        text=True,
        cwd=here,
        timeout=3600,
    )
    queries: dict[str, dict] = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"^(PASS|FAIL|ok|WARN)\s+(\S+?):\s*(.*)$", line)
        if not m:
            continue
        tag, name, rest = m.groups()
        if tag == "WARN":
            if name in queries:
                queries[name]["detail"] = rest.strip()
            continue
        if tag == "PASS":
            rows = int(re.match(r"(\d+) rows", rest).group(1))
            queries[name] = {
                "status": "pass", "mode": "exact_oracle",
                "rows": rows, "detail": None,
            }
        elif tag == "ok":
            rows = int(re.search(r"(\d+) rows", rest).group(1))
            queries[name] = {
                "status": "pass", "mode": "rows_only",
                "rows": rows, "detail": None,
            }
        else:  # FAIL
            queries[name] = {
                "status": "fail", "mode": "exact_oracle",
                "rows": None, "detail": rest.strip()[:500],
            }
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=here,
    ).stdout.strip()
    n_pass = sum(1 for q in queries.values() if q["status"] == "pass")
    n_fail = len(queries) - n_pass
    artifact = {
        "summary": {
            "sf_dir": sf_dir,
            "generated_by": (
                f"python tools/driver_check.py {sf_dir} "
                "(exact compare, zero tolerance) via tools/full_battery.py"
            ),
            "git_head": head,
            "n_queries": len(queries),
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_exact_oracle": sum(
                1 for q in queries.values() if q["mode"] == "exact_oracle"
            ),
            "n_rows_only": sum(
                1 for q in queries.values() if q["mode"] == "rows_only"
            ),
        },
        "queries": queries,
    }
    with open(os.path.join(here, out_path), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["summary"], indent=1))
    sys.exit(1 if n_fail or not queries else 0)


if __name__ == "__main__":
    main()
