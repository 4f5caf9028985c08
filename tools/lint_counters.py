#!/usr/bin/env python3
"""Counter lint (r17 verdict task 4): README's hand-written counters have
drifted twice (spec count stale at 501 while the suite ran 502); this
checks every counter README quotes against the artifacts that define them:

  - query count <- oracle_sql.json written by `graft.Verify` (authoritative:
    Verify dumps exactly SparkEntry.oracleSql, and the gate asserts
    queries.keySet == oracleSql.keySet), or an integer.
  - spec count  <- the sbt test summary line "Total number of tests run: N"
    (pass the sbt log path), or an integer. A static grep can't count the
    suite: the streaming panels register tests from loops.

Usage: lint_counters.py ORACLE_SQL_JSON_OR_N SBT_TEST_LOG_OR_N
Exits 1 on drift (or if a counter pattern vanished from README — a reworded
doc must not silently drop out of the lint)."""
import json
import os
import re
import sys


def main(queries_arg, specs_arg):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()

    if os.path.isfile(queries_arg):
        n_queries = len(json.load(open(queries_arg)))
    else:
        n_queries = int(queries_arg)
    if os.path.isfile(specs_arg):
        m = re.search(r"Total number of tests run: (\d+)", open(specs_arg).read())
        if not m:
            print(f"lint_counters: no sbt test summary in {specs_arg}")
            return 1
        n_specs = int(m.group(1))
    else:
        n_specs = int(specs_arg)

    checks = [
        (r"(\d+) ScalaTest specs", n_specs, "spec count (layout table)"),
        (r"# (\d+) specs", n_specs, "spec count (Running section)"),
        (r"DuckDB oracle \((\d+) queries", n_queries, "query count"),
    ]
    bad = []
    for pat, actual, what in checks:
        hits = list(re.finditer(pat, readme))
        if not hits:
            bad.append(f"{what}: pattern {pat!r} not found in README.md")
        for m in hits:
            if int(m.group(1)) != actual:
                bad.append(f"{what}: README says {m.group(0)!r}, actual {actual}")
    for b in bad:
        print(f"COUNTER DRIFT: {b}")
    print(f"== lint_counters: {'FAIL' if bad else 'ok'} "
          f"(queries={n_queries}, specs={n_specs}) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
