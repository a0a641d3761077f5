#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [--only q1,q2,...]

Loads each <name>/ parquet result written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf_dir tables, and
compares: row count, column names, and values (columns sorted by name, rows
sorted by all columns, exact equality; floats compared bitwise with a
reported max-abs-diff on mismatch).

--only restricts the compare to the named queries (for spot-checks against a
partial `graft.Verify <sfDir> <outDir> <names>` run — without it, every
skipped query would be reported as MISSING_RESULT).

sf_dir tables may be single parquet FILES (the driver's layout) or
DIRECTORIES of part files (graft.ScaleUp's layout); an `events` table whose
`ts` arrives as raw BIGINT nanos (Spark cannot write TIMESTAMP_NS, so scaled
copies land as int64) is rebuilt into the timestamp view the oracles expect.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # bytes / lists → stable repr for sorting+compare
            df[c] = df[c].map(lambda v: repr(v) if isinstance(v, (bytes, list)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str, only: set | None = None) -> int:
    # Arg-order guard: Verify takes (sfDir, outDir), this tool the reverse —
    # name-check both dirs so a swapped invocation dies on one clear line.
    if not (Path(out_dir) / "oracle_sql.json").is_file():
        sys.exit(f"out_dir '{out_dir}' has no oracle_sql.json — arg order is "
                 "(verify_out_dir, sf_dir); did you swap the args?")
    if not (Path(sf_dir) / "events.parquet").exists():
        sys.exit(f"sf_dir '{sf_dir}' has no events.parquet — arg order is "
                 "(verify_out_dir, sf_dir); did you swap the args?")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if not p.exists():
            continue
        src = f"read_parquet('{p}/*.parquet')" if p.is_dir() else f"read_parquet('{p}')"
        if t == "events":
            ts_type = str(con.execute(
                f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0])
            if ts_type == "BIGINT":
                # make_timestamp takes MICROS (this DuckDB has no
                # make_timestamp_ns); the oracles' only consumption of ts is
                # epoch_ns(ts)//1e9, and floor(floor(ns/1e3)*1e3/1e9) ==
                # floor(ns/1e9), so micros truncation is second-exact.
                src = f"(SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM {src})"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    # A query that crashed in Verify writes no result dir — that must read
    # as a FAIL here, not silently vanish from the report.
    present = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for name in oracle:
        if name not in present:
            results[name] = "MISSING_RESULT: query crashed or was not run"
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if only is not None and name not in only:
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(qdir.glob("*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL: {e}"
            continue
        if name not in oracle:
            results[name] = f"rows_only: {len(spark_df)} rows"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_FAIL: {type(e).__name__}: {e}"
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA_MISMATCH: spark={list(s.columns)} duck={list(d.columns)}"
            continue
        dtype_warn = [
            f"{c}({s[c].dtype}!={d[c].dtype})" for c in s.columns
            if s[c].dtype != d[c].dtype
            and not (s[c].dtype.kind == "f" and d[c].dtype.kind == "f")]
        if dtype_warn:
            print(f"[WARN] {name}: dtype drift {'; '.join(dtype_warn)}")
        if len(s) != len(d):
            results[name] = f"ROWS_MISMATCH: spark={len(s)} duck={len(d)}"
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                sv = sv.astype(float)
                dv = dv.astype(float)
                neq = ~((sv == dv) | (sv.isna() & dv.isna()))
                if neq.any():
                    diff = (sv[neq] - dv[neq]).abs().max()
                    bad.append(f"{c}(n={int(neq.sum())},maxdiff={diff})")
            else:
                try:
                    neq = ~((sv == dv) | (pd.isna(sv) & pd.isna(dv)))
                except Exception:
                    neq = sv.astype(str) != dv.astype(str)
                if neq.any():
                    i = int(neq.idxmax())
                    bad.append(f"{c}(n={int(neq.sum())},e.g. {sv[i]!r}!={dv[i]!r})")
        results[name] = "OK" if not bad else "VALUES_MISMATCH: " + "; ".join(bad)
    n_ok = sum(1 for v in results.values() if v == "OK")
    n_ro = sum(1 for v in results.values() if str(v).startswith("rows_only"))
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else ("INFO" if str(v).startswith("rows_only") else "FAIL")
        print(f"[{flag}] {k}: {v}")
    print(f"== {n_ok} oracle-pass, {n_ro} rows-only, "
          f"{len(results) - n_ok - n_ro} fail, of {len(results)}")
    return 0 if len(results) - n_ok - n_ro == 0 else 1


if __name__ == "__main__":
    only = None
    argv = sys.argv[1:]
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], only))
