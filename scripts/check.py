#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle statement in DuckDB against the parquet tables in <sfDir>, loads the
Spark result parquet from <verifyOutDir>/<name>/, and compares: row count,
column names (sorted), and cell values (columns sorted by name, rows
compared as written — both sides carry a total ORDER BY).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def duck_family(duck_type):
    """The pandas dtype FAMILY a DuckDB result column lands in after
    .df() conversion — derived from the relation's bind-time type
    names (con.sql(...).types; the DB-API cursor description only
    carries generic codes like 'NUMBER'), so the gate costs zero extra
    query executions. HUGEINT/UBIGINT widen to float64 (the q90/q84
    driver-hash class); LIST/STRUCT/MAP become object columns holding
    arrays (the q100 sort_values class)."""
    t = str(duck_type).upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "UNION")):
        return "UNSORTABLE(array)"
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "float"  # no 128/unsigned-64 dtype in pandas -> float64
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
        return "float"  # duckdb .df() renders DECIMAL as float64
    if t == "BOOLEAN":
        return "bool"
    if t.startswith(("TIMESTAMP", "DATE")):
        return "datetime"
    return "object"


def pandas_gate(name, o_desc, s_desc):
    """Mirror the driver's pandas conversion: fail on (a) any column
    whose cells would be lists/ndarrays, (b) any oracle-vs-spark dtype
    FAMILY mismatch (int vs float — the HUGEINT → float64 class).
    Families come from the relations' bind-time (name, type) pairs
    built in the main loop, so this costs no re-execution."""
    o_fam = {d[0]: duck_family(d[1]) for d in o_desc}
    s_fam = {d[0]: duck_family(d[1]) for d in s_desc}
    errs = []
    for fams, side in ((o_fam, "oracle"), (s_fam, "spark")):
        for c, fam in fams.items():
            if fam.startswith("UNSORTABLE"):
                errs.append(f"{side}.{c} holds array cells "
                            "(driver sort_values would die)")
    for c, of in o_fam.items():
        sf = s_fam.get(c)
        # ANY family mismatch fails: int-vs-float is the historical
        # HUGEINT class, but bool-vs-int (Python True == 1 makes the
        # value compare succeed locally while the driver's type-strict
        # hasher fails) and every other cross-family pair are the same
        # silent local-pass/driver-fail trap.
        if sf is not None and of != sf:
            errs.append(f"column {c}: dtype family oracle={of} "
                        f"vs spark={sf} — driver hash would mismatch")
    return errs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # relation API: .columns/.types are REAL DuckDB type names
            # resolved at bind time (the DB-API cursor description only
            # carries generic codes like 'NUMBER'/'list', useless for
            # the dtype gate); fetchall() executes the query ONCE.
            o = con.sql(sql)
            o_desc = list(zip(o.columns, [str(t) for t in o.types]))
            o_cols = [d[0] for d in o_desc]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            s = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_desc = list(zip(s.columns, [str(t) for t in s.types]))
            s_cols = [d[0] for d in s_desc]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        on = norm_rows(o_cols, o_rows)
        sn = norm_rows(s_cols, s_rows)
        if on != sn:
            # find first diff (also try set compare to report order-only diffs)
            order_only = sorted(map(repr, on)) == sorted(map(repr, sn))
            for i, (a, b) in enumerate(zip(on, sn)):
                if a != b:
                    print(f"FAIL {name}: first diff row {i} (order_only={order_only}):\n  oracle={a}\n  spark ={b}")
                    break
            n_fail += 1
            continue
        try:
            pd_errs = pandas_gate(name, o_desc, s_desc)
        except Exception as e:
            pd_errs = [f"pandas conversion error: {str(e)[:200]}"]
        if pd_errs:
            print(f"FAIL {name}: driver-pandas gate: {'; '.join(pd_errs)}")
            n_fail += 1
            continue
        if len(o_rows) == 0:
            # the q126 lesson: a composed gate whose stages empty BOTH
            # sides is hash-green while proving nothing. Non-fatal —
            # some gates (anti-joins) are legitimately empty — but a
            # NEW gate showing up here needs a survivorship probe.
            print(f"WARN {name}: VACUOUS gate (0 rows) — hash equality "
                  "proves nothing; confirm emptiness is the semantics")
        print(f"PASS {name} ({len(o_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
