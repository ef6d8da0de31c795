#!/usr/bin/env python3
"""Local mimic of the driver's t2 oracle check (dev tool only, not part
of the library). Usage: check.py [sfDir] [verifyOutDir] [queryFilter...]

Reads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL in DuckDB against the same input tables, and
compares (columns sorted by name, rows sorted by all columns, exact
value equality — floats too, to approximate the driver's hash compare).
"""
import duckdb, json, sys, os, glob, math

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == 0.0: return 0.0  # normalize -0.0
        return v
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    ok = bad = noracle = 0
    for name in names:
        if only and name not in only: continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); bad += 1; continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{files[0]}')")
        if name not in oracle:
            n = len(spark_rel.fetchall())
            print(f"rows  {name}: no oracle, {n} rows"); noracle += 1; continue
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); bad += 1; continue
        scols, dcols = sorted(spark_rel.columns), sorted(duck_rel.columns)
        if scols != dcols:
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}"); bad += 1; continue
        stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        dtypes = dict(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
        tdiff = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
        if tdiff:
            print(f"TYPE  {name}: {tdiff}")
        q = ", ".join(f'"{c}"' for c in scols)
        # FAST PATH for big results (row-proportional queries at scale
        # corpora): a python fetchall + per-value normalize + sort is
        # O(rows) python objects — 15M-row results took tens of
        # minutes each at 26x. Equivalent multiset compare done
        # INSIDE duckdb: counts equal AND symmetric EXCEPT ALL empty.
        # Both sides cast to the oracle's types (the python path's
        # loose cross-type value equality, made explicit); float
        # columns add +0.0 so -0.0 folds onto 0.0 exactly like norm();
        # NaN=NaN holds in duckdb's EXCEPT semantics natively.
        nS = con.sql("SELECT count(*) FROM spark_rel").fetchone()[0]
        nD = con.sql("SELECT count(*) FROM duck_rel").fetchone()[0]
        # guard rails (code-review r10): the fast path must not CAST
        # across a cross-engine type mismatch (a lossy cast could mask
        # a real divergence the slow path would FAIL), and its -0.0
        # fold only covers top-level floats — so any type mismatch or
        # nested (LIST/STRUCT) column falls back to the exact python
        # compare regardless of size.
        simple = {"BIGINT","INTEGER","SMALLINT","TINYINT","HUGEINT","UBIGINT",
                  "UINTEGER","FLOAT","DOUBLE","VARCHAR","DATE","BOOLEAN"}
        def simple_t(t):
            return t in simple or t.startswith("DECIMAL") or t.startswith("TIMESTAMP")
        fastable = not tdiff and all(simple_t(dtypes[c]) for c in scols)
        if (nS > 100000 or nD > 100000) and fastable:
            if nS != nD:
                print(f"FAIL  {name}: spark {nS} rows vs duck {nD}"); bad += 1; continue
            def sel(rel):
                cols = []
                for c in scols:
                    e = f'"{c}"'
                    if dtypes[c] in ("FLOAT", "DOUBLE"):
                        e = f"({e} + 0.0)"
                    cols.append(f'{e} AS "{c}"')
                return f"SELECT {', '.join(cols)} FROM {rel}"
            try:
                diff = con.sql(
                    f"({sel('spark_rel')} EXCEPT ALL {sel('duck_rel')}) "
                    f"UNION ALL ({sel('duck_rel')} EXCEPT ALL {sel('spark_rel')}) "
                    f"LIMIT 3").fetchall()
            except Exception as e:
                print(f"FAIL  {name}: fast-path compare error: {e}"); bad += 1; continue
            if not diff:
                print(f"ok    {name}: {nS} rows"); ok += 1
            else:
                print(f"FAIL  {name}: {nS} rows, multiset diff e.g. {diff[:2]}"); bad += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in
                 con.sql(f"SELECT {q} FROM spark_rel").fetchall()]
        drows = [tuple(norm(v) for v in r) for r in
                 con.sql(f"SELECT {q} FROM duck_rel").fetchall()]
        key = lambda r: tuple((v is None, str(type(v)), str(v)) for v in r)
        srows.sort(key=key); drows.sort(key=key)
        if srows == drows:
            print(f"ok    {name}: {len(srows)} rows"); ok += 1
        else:
            bad += 1
            print(f"FAIL  {name}: spark {len(srows)} rows vs duck {len(drows)}")
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"      first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            else:
                tail = srows[len(drows):] or drows[len(srows):]
                if tail: print(f"      extra rows: {tail[:2]}")
    print(f"\n{ok} ok, {bad} FAIL, {noracle} rows-only")
    sys.exit(1 if bad else 0)

main()
