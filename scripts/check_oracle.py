#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage:
  python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs each
oracle in DuckDB against the parquet tables in <sf_dir>, and compares with
the Spark result parquet in <verify_out_dir>/<name>/ — column names sorted,
values normalized — mirroring the driver's rows/schema/hash check closely
enough to catch dialect and aliasing bugs before the round ends.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr, not a %g format: round 2 proved the driver's hash is
        # type-sensitive — DuckDB HUGEINT aggregates (count_if, sum of
        # ints) come through pandas as float64 and render "2.0" where
        # Spark's BIGINT renders "2" (q28/q62/q98 passed here at .10g yet
        # hash-mismatched in CORRECTNESS_r02). repr keeps the trailing
        # ".0" AND full round-trip precision, so both the type-shape and
        # any last-ulp engine difference are treated as a FAIL.
        return repr(v)
    try:  # Decimal → float-ish
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_err = 0
    for name, sql in sorted(oracles.items()):
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[-1]}")
            n_err += 1
            continue
        try:
            sdf = duckdb.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_err += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}")
            n_bad += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
            n_bad += 1
            continue
        # sorted: the driver's hash compare proved row-order-insensitive in
        # round 1 (q02 matched despite dup sort keys ordering differently)
        key = lambda t: tuple((x is None, x) for x in t)
        orows = sorted((tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False)), key=key)
        srows = sorted((tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False)), key=key)
        if orows != srows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:\n  oracle {orows[bad]}\n  spark  {srows[bad]}")
            n_bad += 1
            continue
        n_ok += 1
        print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\n{n_ok} ok, {n_bad} mismatched, {n_err} errored")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
