#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark parquet dump from
graft.Verify (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest(), len(out)

fails = []
for name in sorted(oracles):
    sql = oracles[name]
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oh, on = canon(orows, ocols)
        sh, sn = canon(srows, scols)
        schema_ok = sorted(ocols) == sorted(scols)
        ok = schema_ok and oh == sh
        status = "OK " if ok else "FAIL"
        print(f"{status} {name}: rows oracle={on} spark={sn} schema={'ok' if schema_ok else f'{sorted(ocols)} vs {sorted(scols)}'} hash={'ok' if oh==sh else 'MISMATCH'}")
        if not ok:
            fails.append(name)
            if on and sn:
                print("  oracle[0]:", orows[0])
                print("  spark [0]:", srows[0])
    except Exception as e:
        print(f"ERR {name}: {str(e)[:300]}")
        fails.append(name)

rows_only = [n for n in sorted(set(
    p.split('/')[-1] for p in glob.glob(f"{out_dir}/*") if '.' not in p.split('/')[-1]
)) if n not in oracles]
print(f"\nrows-only (no oracle): {rows_only}")
print(f"\n{'ALL OK' if not fails else 'FAILURES: ' + str(fails)}")
sys.exit(1 if fails else 0)
