#!/usr/bin/env python3
"""Local dev loop approximating the driver's t2 correctness gate:
run graft.Verify first (writes <outdir>/<query>/ parquet + oracle_sql.json),
then this script compares each Spark result against DuckDB on the same tables.

Usage: python3 tools/oracle_check.py <sfdir> <outdir>
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or str(df[c].dtype) == "dbdate":
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None and not (isinstance(v, float) and pd.isna(v)) else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok, fails = 0, []
    for name in sorted(oracle):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                fails.append((name, "no spark output")); continue
            sdf = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            odf = canon(con.sql(oracle[name]).df())
            if list(sdf.columns) != list(odf.columns):
                fails.append((name, f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")); continue
            if len(sdf) != len(odf):
                fails.append((name, f"rowcount spark={len(sdf)} oracle={len(odf)}")); continue
            bad = []
            for c in sdf.columns:
                a, b = sdf[c], odf[c]
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad.append(f"{c} (row {i}: spark={a[i]!r} oracle={b[i]!r}, {int((~eq).sum())} diffs)")
            if bad:
                fails.append((name, "values: " + "; ".join(bad)))
            else:
                n_ok += 1
        except Exception as e:
            fails.append((name, f"error: {e}"))
    missing = [q for q in glob.glob(f"{outdir}/q*") if q.split("/")[-1] not in oracle]
    print(f"{'FAIL' if fails else 'OK'}: {n_ok}/{len(oracle)} oracled queries match; {len(missing)} rows-only queries")
    for name, msg in fails:
        print(f"  FAIL {name}: {msg[:300]}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
