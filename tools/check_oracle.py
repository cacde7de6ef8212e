#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's dumped
parquet against the DuckDB oracle SQL and diff (sorted columns, sorted
rows, value-level compare). Usage: check_oracle.py <sfDir> <verifyOut>."""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return norm(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=lambda r: tuple(
        (x is None, str(x)) for x in r))

fails = 0
for name in sorted(glob.glob(f"{outdir}/*/")):
    qname = name.rstrip("/").split("/")[-1]
    spark_rel = con.sql(f"SELECT * FROM '{name}*.parquet'")
    scols, srows = canon(spark_rel.columns, spark_rel.fetchall())
    if qname not in oracle:
        print(f"  {qname}: NO-ORACLE rows={len(srows)}")
        continue
    o_rel = con.sql(oracle[qname])
    # The driver hashes TYPED values: DuckDB window sum() yields HUGEINT
    # (INT128) and decimal arithmetic yields DECIMAL128 — both hash-mismatch
    # against Spark's 64-bit types even when values are identical. Fail any
    # oracle whose output schema contains a >64-bit numeric so the local
    # gate catches this class before the driver does.
    wide = [(c, t) for c, t in zip(o_rel.columns, o_rel.types)
            if "HUGEINT" in str(t).upper()
            or ("DECIMAL" in str(t).upper() and
                int(str(t).split("(")[1].split(",")[0]) > 18)]
    ocols, orows = canon(o_rel.columns, o_rel.fetchall())
    ok = True
    if wide:
        print(f"FAIL {qname}: oracle emits >64-bit numeric columns {wide} "
              f"(driver's typed hash will mismatch; CAST to BIGINT)")
        ok = False
    elif scols != ocols:
        print(f"FAIL {qname}: columns spark={scols} oracle={ocols}")
        ok = False
    elif len(srows) != len(orows):
        print(f"FAIL {qname}: rowcount spark={len(srows)} oracle={len(orows)}")
        ok = False
    elif srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        print(f"FAIL {qname}: value diff, first={diffs}")
        ok = False
    if ok:
        print(f"  {qname}: OK rows={len(srows)}")
    else:
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
