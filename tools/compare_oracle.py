#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replays oracle_sql.json in
DuckDB against the sf tables and diffs against the Verify parquet dumps.
Mimics a column-name-sorted, row-sorted value comparison."""
import sys, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(rows):
    def c(v):
        if isinstance(v, float):
            return repr(round(v, 9))
        return repr(v)
    return sorted([tuple(c(v) for v in r) for r in rows])

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = sorted(got.columns)
            got_rows = norm(con.sql(
                f"SELECT {', '.join(got_cols)} FROM read_parquet({files!r})").fetchall())
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            wc = ", ".join(want_cols)
            want_rows = norm(con.sql(f"SELECT {wc} FROM ({sql}) _q").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); n_fail += 1; continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}"); n_fail += 1; continue
        if got_rows != want_rows:
            diffs = [(a, b) for a, b in zip(got_rows, want_rows) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
