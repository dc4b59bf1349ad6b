#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's output
parquet per query, run the oracle SQL in DuckDB over the same sf dir,
compare row count, schema (column names sorted), and values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Dev tool only — the engine itself is pure Scala/Spark.)
"""
import sys, os, json, math
import duckdb

def canon(rows, cols):
    # sort columns by name, values to comparable canonical form
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(repr(v))
            else:
                rr.append(repr(v))
        out.append(tuple(rr))
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracles:
            status = f"ROWS-ONLY rows={len(grows)}"
            print(f"  {name}: {status}")
            continue
        # Guard: the driver materializes oracle results through pandas,
        # where HUGEINT/DECIMAL become float64 ("123.0" != "123" under
        # value hashing even when fetchall() compares equal). Reject any
        # oracle whose OUTPUT types would survive fetchall() but diverge
        # on the driver (root cause of the r4/r5 q62+q67 hash reds).
        SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                "FLOAT", "VARCHAR", "BOOLEAN", "DATE",
                # plain (UTC-naive) timestamps only: WITH TIME ZONE
                # becomes tz-aware in pandas and can diverge from
                # Spark's UTC-naive output
                "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S"}
        sql = oracles[name].rstrip().rstrip(";")
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        odd = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) not in SAFE]
        if odd:
            n_fail += 1
            print(f"  {name}: FAIL pandas-unsafe oracle output types {odd}"
                  " (CAST them; driver hashes via pandas)")
            continue
        want = con.execute(oracles[name])
        wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        problems = []
        if sorted(gcols) != sorted(wcols):
            problems.append(f"schema {sorted(gcols)} != {sorted(wcols)}")
        elif len(grows) != len(wrows):
            problems.append(f"rowcount {len(grows)} != {len(wrows)}")
        else:
            g, w = canon(grows, gcols), canon(wrows, wcols)
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
            if bad:
                i, a, b = bad[0]
                problems.append(
                    f"{len(bad)}/{len(g)} rows differ; first@{i}:\n"
                    f"    got  {a}\n    want {b}")
        if problems:
            n_fail += 1
            print(f"  {name}: FAIL {problems[0]}")
        else:
            n_pass += 1
            print(f"  {name}: OK ({len(grows)} rows)")
    print(f"pass={n_pass} fail={n_fail} "
          f"rows_only={len(names)-n_pass-n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
