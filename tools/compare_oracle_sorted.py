#!/usr/bin/env python3
"""Row-sorted variant of compare_oracle.py, mirroring the DRIVER's compare
more closely: the driver canonicalizes BOTH sides with a pandas row sort
(its rt_embeddings err trace shows frame.sort_values/lexsort) before
hashing, so tie order under the query's ORDER BY does not matter there.
compare_oracle.py hashes rows in file order, which is stricter than the
driver on ties — use this tool to distinguish "tie order differs" from a
real mismatch.

Usage: python3 tools/compare_oracle_sorted.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(table):
    cols = sorted(table.column_names)
    df = table.select(cols).to_pandas()
    try:
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        # unsortable cell types (e.g. numpy arrays): stringify then sort
        df = df.astype(str).sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row)).encode())
    return cols, [str(table.schema.field(c).type) for c in cols], h.hexdigest(), len(df), df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"{name}: MISSING spark output")
            fails += 1
            continue
        s_cols, s_types, s_hash, s_rows, s_df = canon(pq.read_table(spark_files[0]))
        o_cols, o_types, o_hash, o_rows, o_df = canon(con.execute(sql).arrow())
        ok_rows = s_rows == o_rows
        ok_schema = s_cols == o_cols
        ok_hash = s_hash == o_hash
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={ok_rows}({s_rows}/{o_rows}) schema={ok_schema} hash={ok_hash}")
        if not ok_schema:
            print(f"  spark  cols: {list(zip(s_cols, s_types))}")
            print(f"  oracle cols: {list(zip(o_cols, o_types))}")
        if ok_schema and ok_rows and not ok_hash:
            for c in s_cols:
                a, b = s_df[c].astype(str), o_df[c].astype(str)
                if not a.equals(b):
                    diff = (a != b)
                    i = diff.idxmax()
                    print(f"  col {c}: first diff at row {i}: spark={a[i]!r} oracle={b[i]!r} (n={diff.sum()})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
