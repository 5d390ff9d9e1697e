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
import numpy as np

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


def dtype_family(dtype, sample):
    """Classify a pandas dtype the way the driver's hasher sees it."""
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        # object column: a list/ndarray cell is unsortable/unhashable in
        # the driver's pandas path (the q100 lesson) — flag it distinctly.
        if sample is not None and isinstance(sample, (list, np.ndarray)):
            return "UNSORTABLE(array)"
        return "object"
    return str(dtype)


def pandas_gate(name, con, sql, out_dir):
    """Mirror the driver's pandas conversion: both sides via .df(), then
    fail on (a) any column whose cells are lists/ndarrays, (b) any
    oracle-vs-spark dtype FAMILY mismatch (int vs float — the HUGEINT →
    float64 class from q90/q84). fetchall() yields native ints and
    structurally cannot catch either class."""
    o_df = con.execute(sql).df()
    s_df = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    errs = []
    for df, side in ((o_df, "oracle"), (s_df, "spark")):
        for c in df.columns:
            nn = df[c].dropna()
            sample = nn.iloc[0] if len(nn) else None
            fam = dtype_family(df[c].dtype, sample)
            if fam.startswith("UNSORTABLE"):
                errs.append(f"{side}.{c} holds array cells "
                            "(driver sort_values would die)")
    for c in o_df.columns:
        if c not in s_df.columns:
            continue
        onn = o_df[c].dropna()
        snn = s_df[c].dropna()
        of = dtype_family(o_df[c].dtype, onn.iloc[0] if len(onn) else None)
        sf = dtype_family(s_df[c].dtype, snn.iloc[0] if len(snn) else None)
        if of != sf and {of, sf} <= {"int", "float"}:
            errs.append(f"column {c}: dtype family oracle={of} "
                        f"({o_df[c].dtype}) vs spark={sf} ({s_df[c].dtype})"
                        " — driver hash would mismatch")
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
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            s = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        # The driver's hasher is type-strict (e.g. DuckDB sum(BIGINT) yields
        # HUGEINT, which hash-mismatches Spark's BIGINT even when every value
        # is identical) — so compare result column TYPES, not just names.
        o_types = {d[0]: str(d[1]) for d in o.description}
        s_types = {d[0]: str(d[1]) for d in s.description}
        type_diff = {c: (o_types[c], s_types[c]) for c in o_types
                     if o_types[c] != s_types[c]}
        if type_diff:
            print(f"FAIL {name}: column types differ (oracle, spark): {type_diff}")
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
            pd_errs = pandas_gate(name, con, sql, out_dir)
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
