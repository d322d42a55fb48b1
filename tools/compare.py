#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage: compare.py <sfDir> <verifyOut>
(dev tool only — the engine itself is pure Scala/Spark)."""
import sys, os, json, math
import duckdb, pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracles.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        got = pq.read_table(pdir).to_pandas()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"[SCHM] {name}: spark={gcols} duck={ecols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"[ROWS] {name}: spark={len(g)} duck={len(e)}"); fail += 1; continue
    # Driver-hash proxy: the real gate hashes RENDERED values, so an
    # int column on one side vs float on the other (e.g. DuckDB HUGEINT
    # -> pandas float64) fails there even when values compare equal.
    dtyp = [c for c in gcols
            if ('int' in str(g[c].dtype)) != ('int' in str(e[c].dtype))
            and ('float' in str(g[c].dtype) or 'float' in str(e[c].dtype))]
    if dtyp:
        print(f"[DTYP] {name}: int-vs-float cols {dtyp} "
              f"(spark={[str(g[c].dtype) for c in dtyp]} duck={[str(e[c].dtype) for c in dtyp]})")
        fail += 1; continue
    mismatch = None
    for c in gcols:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            same = (a == b) or (a is None and b is None) or \
                   (isinstance(a, float) and isinstance(b, float)
                    and (a == b or (math.isnan(a) and math.isnan(b))))
            if not same:
                mismatch = (c, i, a, b); break
        if mismatch: break
    if mismatch:
        c, i, a, b = mismatch
        print(f"[VAL ] {name}: col={c} row={i} spark={a!r} duck={b!r}"); fail += 1
    else:
        ok += 1
print(f"\n{ok} ok, {fail} failed of {len(oracles)}")
sys.exit(1 if fail else 0)
