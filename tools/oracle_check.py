#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - run the SQL in DuckDB with views named after the parquet tables,
  - load the Spark result parquet from <verifyOutDir>/<name>/,
  - sort columns by name, sort rows, compare values exactly.
Reports PASS/FAIL per query, with first diffs on failure.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a cell for comparison (mirror of a hash on str values)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exactness is the goal
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def norm_type(t):
    """Normalize a declared type name the way the driver's hash does.

    Round 12 FALSIFIED the round-1 theory that int widths never red:
    `mig_mssql_quirks` hash-redded in the driver on exactly SMALLINT
    (oracle) vs INTEGER (spark) with every cell value equal. But the
    SAME driver run greened 50 rows with INTEGER (spark) vs BIGINT
    (oracle) AND 2 rows with TINYINT (oracle bit_count) vs INTEGER —
    so the driver's normalization collapses TINYINT/INTEGER/BIGINT
    and leaves SMALLINT (and HUGEINT) distinct. Mirror exactly that
    observed behavior. Timestamps still normalize alike
    (driver-confirmed green TIMESTAMP/TIMESTAMP_NS).
    """
    s = str(t).upper()
    if s in ("TINYINT", "INTEGER", "BIGINT"):
        return "INT_FAM"  # NOT smallint/hugeint — those red (r12)
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return s


def table_of(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    only = sys.argv[3:] or sorted(oracle)
    for name in only:
        sql = oracle[name]
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        try:
            d = con.sql(sql)
            d_cols, d_rows = list(d.columns), d.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sres = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols, s_rows = list(sres.columns), sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        # Driver-verifiable output envelope: the driver's harness
        # crashes on BLOB cells (pandas sort, r13), hash-reds
        # value-identical DECIMAL columns (r12/r13), and crashes its
        # pandas sort on ANY container cell (r18 ta_bpe_token_ids:
        # LIST → `unhashable type: 'numpy.ndarray'`) — `norm` below
        # would happily green all of them (it stringifies lists!), so
        # REFUSE them on either side instead of normalizing them away
        # (mirror red ⇔ driver red). This is the exact gap that let
        # the r18 builder gate claim 272/272 while the driver saw 271.
        envelope_bad = [
            (side, c, str(t))
            for side, cols_types in (("oracle", zip(d.columns, d.types)),
                                     ("spark", zip(sres.columns, sres.types)))
            for c, t in cols_types
            if "DECIMAL" in str(t).upper() or "BLOB" in str(t).upper()
            or "BINARY" in str(t).upper()
            or any(k in str(t).upper()
                   for k in ("LIST", "[]", "STRUCT", "MAP"))]
        if envelope_bad:
            print(f"FAIL {name}: output schema outside the driver-"
                  f"verifiable envelope (DECIMAL/BLOB/LIST/STRUCT/MAP): "
                  f"{envelope_bad}")
            n_fail += 1
            continue
        dc, dr = table_of(d_rows, d_cols)
        sc, sr = table_of(s_rows, s_cols)
        if dc != sc:
            print(f"FAIL {name}: columns differ\n  oracle: {dc}\n  spark:  {sc}")
            n_fail += 1
            continue
        # The driver's hash normalizes each engine's *declared* type, so a
        # value-identical result still reds out when the types differ
        # (e.g. DuckDB HUGEINT vs Spark BIGINT, DECIMAL(38,s) vs (28,s)).
        # Fail on any declared-type mismatch so this mirror predicts the
        # driver gate instead of silently passing on values.
        # align by sorted (name, type) pairs — a dict would collapse
        # duplicate column names and could hide a mismatch
        d_types = sorted((c, norm_type(t)) for c, t in zip(d.columns, d.types))
        s_types = sorted((c, norm_type(t)) for c, t in zip(sres.columns, sres.types))
        type_diffs = [(c1, t1, t2) for (c1, t1), (_, t2)
                      in zip(d_types, s_types) if t1 != t2]
        if type_diffs:
            print(f"FAIL {name}: declared types differ")
            for c, dt, st in type_diffs:
                print(f"  {c}: oracle={dt} spark={st}")
            n_fail += 1
            continue
        if dr == sr:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
            continue
        n_fail += 1
        print(f"FAIL {name}: rows differ (oracle {len(dr)}, spark {len(sr)})")
        shown = 0
        for i in range(max(len(dr), len(sr))):
            a = dr[i] if i < len(dr) else None
            b = sr[i] if i < len(sr) else None
            if a != b:
                print(f"  row {i}: oracle={a}\n          spark ={b}")
                shown += 1
                if shown >= 3:
                    break
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
