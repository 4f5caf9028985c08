#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
`graft.Verify` into OUTDIR, run its DuckDB oracle SQL (oracle_sql.json)
against the raw testdata parquet and hash-compare both result sets with
columns sorted by name and rows sorted by value. Dev tool only — the shipped
library is pure Scala/Spark."""
import decimal
import json
import os
import sys
import threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    # Decimal repr is representation-sensitive (exponent form vs plain,
    # Decimal('1E+2') vs Decimal('100')) and diverged between the Spark
    # and DuckDB sides of the round-9 gate while values were identical.
    # Canonicalize to the digit string: exact for scale-0, plain
    # (non-exponent) fixed-point otherwise.
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        return format(v.normalize(), "f")
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_value(r[i]) for i in order))
    out.sort()
    return out


def main(sf_dir, out_dir, timeout_sec=None, expected_skips=()):
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            # Spark-written tables (the ScaleData sf1 dirs) are parquet
            # DIRECTORIES; the driver's testdata is single files — glob
            # when it's a dir so the same gate runs against either layout
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return c

    con = connect()

    # Optional per-query budget (the sf1 gate): a watchdog interrupts the
    # running DuckDB query after timeout_sec, recording TIMEOUT instead of
    # hanging the whole gate on one quadratic oracle — the empirical skip
    # list the round-16 verdict asks to name. The callback only interrupts
    # while this query is still marked running (r16 advisory: a timer that
    # fires in the fetchall→cancel window would otherwise interrupt an
    # idle connection and misfire on the NEXT query), and a fired watchdog
    # poisons the connection state enough that we reconnect after each
    # recorded timeout.
    lock = threading.Lock()

    def with_timeout(fn, state):
        if not timeout_sec:
            return fn()
        def interrupt():
            with lock:
                if state["running"]:
                    state["fired"] = True
                    con.interrupt()
        timer = threading.Timer(timeout_sec, interrupt)
        timer.start()
        try:
            return fn()
        finally:
            with lock:
                state["running"] = False
            timer.cancel()

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    timeouts = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = spark_rel.columns
            duck_rel = con.sql(sql)
            duck_cols = duck_rel.columns
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns differ spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_bad += 1
            continue
        # Type-strict gate (r14 verdict task 2), BEFORE any fetch: the
        # driver's hasher is type-sensitive, so an oracle whose DuckDB
        # result widens a column (uncast windowed sum() → HUGEINT/INT128,
        # DECIMAL scale drift) fails the driver while identical VALUES
        # pass here. Relation .types is metadata — rejecting on it keeps
        # a type-drifted banded-SQL oracle from paying two full
        # materializations it would then discard.
        spark_types = dict(zip(spark_cols, map(str, spark_rel.types)))
        duck_types = dict(zip(duck_cols, map(str, duck_rel.types)))
        type_bad = [
            (c, spark_types[c], duck_types[c])
            for c in sorted(spark_types)
            if spark_types[c] != duck_types[c]
        ]
        if type_bad:
            n_bad += 1
            print(f"TYPEFAIL {name}: " + "; ".join(
                f"{c}: spark={s} duck={d}" for c, s, d in type_bad),
                flush=True)
            continue
        state = {"running": True, "fired": False}
        try:
            spark_rows = spark_rel.fetchall()
            duck_rows = with_timeout(duck_rel.fetchall, state)
        except duckdb.InterruptException:
            timeouts.append(name)
            print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s", flush=True)
            con = connect()
            continue
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            if timeout_sec and "INTERRUPT" in msg.upper():
                timeouts.append(name)
                print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s", flush=True)
                con = connect()
                continue
            print(f"FAIL {name}: {msg}")
            n_bad += 1
            continue
        if state["fired"]:
            # The watchdog fired but the fetch returned anyway (the
            # interrupt landed in the completion window) — the stale
            # interrupt flag could poison the NEXT statement, so drop the
            # connection; this query's rows are complete and compare below.
            con = connect()
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a == b:
            print(f"OK   {name}: {len(a)} rows", flush=True)
            n_ok += 1
        else:
            n_bad += 1
            set_a, set_b = set(a), set(b)
            diff_a = [r for r in a if r not in set_b][:3]
            diff_b = [r for r in b if r not in set_a][:3]
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}", flush=True)
            print(f"     spark-only: {diff_a}")
            print(f"     duck-only:  {diff_b}")
            if name == "x18_ann_ivf":
                # x18's oracle is exact brute force under measured recall
                # 1.0; surface the recall Verify measured in-session so this
                # failure is classifiable as recall-loss vs algorithm bug.
                try:
                    rec = json.load(open(f"{out_dir}/x18_recall.json"))
                    kind = ("recall loss (corpus-dependent gate artifact)"
                            if rec.get("recall", 1.0) < 1.0
                            else "recall=1.0 → dataflow divergence (real bug)")
                    print(f"     x18 measured recall: {rec} → {kind}")
                except Exception:
                    print("     x18_recall.json unavailable")
    if timeouts:
        print(f"== skip list (oracle > {timeout_sec}s): {','.join(timeouts)} ==")
    # Timeouts outside the pinned expected-skip list fail the gate (r16
    # advisory): a previously-green oracle that regresses into a hang must
    # not exit 0 on the strength of a skip line nobody reads.
    unexpected = [t for t in timeouts if t not in set(expected_skips)]
    if unexpected:
        print(f"== UNEXPECTED timeouts (not in expected-skip list): "
              f"{','.join(unexpected)} ==")
    # Reconcile the pinned list against reality (r17 advisory): an
    # expected-skip that completed within budget is stale — left in place
    # it would mask a future regression of that oracle back into a
    # timeout. Loud warning, not a failure: one fast host run must not
    # flap the gate for a genuinely borderline oracle; the skill doc says
    # to prune warned names from the pinned file.
    stale = [e for e in expected_skips
             if e not in set(timeouts) and e in oracle]
    if stale:
        print(f"== STALE expected-skips (completed within budget — prune "
              f"from the pinned list): {','.join(stale)} ==")
    ghost = [e for e in expected_skips if e not in oracle]
    if ghost:
        print(f"== UNKNOWN expected-skips (no such oracle): "
              f"{','.join(ghost)} ==")
    print(f"== {n_ok} ok, {n_bad} bad, {len(timeouts)} timeout "
          f"({len(unexpected)} unexpected) ==")
    return 1 if n_bad or unexpected else 0


def load_skips(arg):
    """4th argv: a file of names (the pinned repo list — one per line or
    comma-separated, '#' comments) or an inline CSV. Empty entries are
    dropped (r17 advisory: ''.split(',') == [''] would pin a ghost)."""
    if os.path.isfile(arg):
        text = " ".join(line.split("#")[0] for line in open(arg))
        parts = text.replace(",", " ").split()
    else:
        parts = arg.split(",")
    return [p.strip() for p in parts if p.strip()]


if __name__ == "__main__":
    # argv: SF_DIR OUT_DIR [TIMEOUT_SEC [EXPECTED_SKIPS_CSV_OR_FILE]]
    # With a watchdog but no 4th arg, the pinned repo list applies (r17
    # verdict task 3: the skip list must live in the repo, not in a CLI
    # string that has to match the skill doc by hand).
    default_skips = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "expected_skips_sf1.csv")
    if len(sys.argv) > 4:
        skips = load_skips(sys.argv[4])
    elif len(sys.argv) > 3 and os.path.isfile(default_skips):
        skips = load_skips(default_skips)
    else:
        skips = ()
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else None,
                  skips))
