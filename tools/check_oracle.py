#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark-dumped parquet
(columns sorted by name, values hashed). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # sort columns by name, then rows by full tuple for a stable hash
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    m = hashlib.sha256()
    for col in df.columns:
        for v in df[col].tolist():
            if isinstance(v, float):
                m.update(f"{v!r}".encode())
            else:
                m.update(str(v).encode())
        m.update(b"|")
    return m.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = pq.read_table(pdir).to_pandas()
        except Exception as e:
            results[name] = f"SPARK_READ_ERROR: {e}"
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"DUCKDB_ERROR: {type(e).__name__}: {e}"
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(x.columns)}"
        elif len(g) != len(x):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} duck={len(x)}"
        elif h(g) != h(x):
            # find first differing row for debugging
            diff = None
            for i in range(len(g)):
                if tuple(g.iloc[i]) != tuple(x.iloc[i]):
                    diff = f"row {i}: spark={tuple(g.iloc[i])} duck={tuple(x.iloc[i])}"
                    break
            results[name] = f"HASH_MISMATCH ({diff})"
        else:
            results[name] = "OK"
    # queries without oracle: rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = pq.read_table(p).num_rows
                results[name] = f"ROWS_ONLY rows={n}" + ("" if n > 0 else " (EMPTY!)")
            except Exception as e:
                results[name] = f"ROWS_ONLY_READ_ERROR: {e}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {ok}/{len(oracle)} oracle-checked queries match ==")
    sys.exit(0 if ok == len(oracle) else 1)

if __name__ == "__main__":
    main()
