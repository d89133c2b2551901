#!/usr/bin/env python3
"""Determinism sweep compare: two Verify output dirs (produced with
different SPARK_GRAFT_CPUS) must contain value-identical results for
every query once rows are sorted — catches any ordering-sensitive
accumulation (double sums, first/last without ordering) that a
partitioning change would surface on a real cluster.

Usage: determinism_check.py DIR_A DIR_B
"""
import sys
import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(
    p.name for p in __import__("pathlib").Path(a).iterdir()
    if p.is_dir())
div = 0
for n in names:
    try:
        q = f"""
        SELECT count(*) FROM (
          (SELECT * FROM '{a}/{n}/*.parquet' EXCEPT ALL
           SELECT * FROM '{b}/{n}/*.parquet')
          UNION ALL
          (SELECT * FROM '{b}/{n}/*.parquet' EXCEPT ALL
           SELECT * FROM '{a}/{n}/*.parquet'))"""
        d = duckdb.sql(q).fetchone()[0]
    except Exception as e:  # schema mismatch is also divergence
        print(f"DIVERGE {n}: {e}")
        div += 1
        continue
    if d:
        print(f"DIVERGE {n}: {d} rows differ")
        div += 1
print(f"== {len(names)} queries, {div} divergent ==")
sys.exit(1 if div else 0)
