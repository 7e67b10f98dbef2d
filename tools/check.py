#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the library): runs Verify's oracle_sql.json in DuckDB against the same
sf dir and compares with the Spark parquet dumps, normalizing column order
and row order like the driver does."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sdf = pq.read_table(files[0]).to_pandas()
    oc, sc = sorted(odf.columns), sorted(sdf.columns)
    if oc != sc:
        print(f"FAIL {name}: cols oracle={oc} spark={sc}"); fails += 1; continue
    # Dtype-strict, like the driver: an int64 Spark column vs a float64
    # oracle column (e.g. DuckDB HUGEINT -> pandas float) must FAIL even
    # when the values are numerically equal — the driver's hash is over
    # dtype-rendered values ("1" vs "1.0").
    def kind(dt):
        k = dt.kind  # i/u -> int, f -> float, b -> bool, M -> datetime, O -> object
        return {"i": "int", "u": "int"}.get(k, k)
    dtype_bad = [c for c in oc if kind(odf[c].dtype) != kind(sdf[c].dtype)
                 # all-NULL object columns are indistinguishable; skip those
                 and not (odf[c].isna().all() or sdf[c].isna().all())]
    if dtype_bad:
        msg = {c: (str(odf[c].dtype), str(sdf[c].dtype)) for c in dtype_bad}
        print(f"FAIL {name}: dtype mismatch (oracle,spark) {msg}"); fails += 1; continue
    o = odf[oc].values.tolist(); s = sdf[sc].values.tolist()
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NULL"
            return f"{v:.9g}"
        return str(v)
    o = sorted([tuple(norm(x) for x in r) for r in o])
    s = sorted([tuple(norm(x) for x in r) for r in s])
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}"); fails += 1; continue
    if o != s:
        bad = [(a, b) for a, b in zip(o, s) if a != b][:3]
        print(f"FAIL {name}: value mismatch e.g. {bad}"); fails += 1; continue
    print(f"OK   {name}: {len(s)} rows")
sys.exit(1 if fails else 0)
