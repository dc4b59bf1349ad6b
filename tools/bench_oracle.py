#!/usr/bin/env python3
"""Record per-query DuckDB oracle wall times so the bench JSON can
report engine-vs-oracle ratios per query (not just the three numbers
published in BASELINE.md).

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOutDir>
  <verifyOutDir> must contain oracle_sql.json (written by graft.Verify).

Writes tools/oracle_times_<sfName>.json; graft.Bench embeds it as
"oracle_sec" when benching the same sf dir. (Dev tool only — the
engine itself is pure Scala/Spark.)
"""
import sys, os, json, time
import duckdb

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
    times = {}
    for name in sorted(oracles):
        t0 = time.monotonic()
        con.execute(oracles[name]).fetchall()
        times[name] = round(time.monotonic() - t0, 3)
        print(f"  {name}: {times[name]} s", flush=True)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"oracle_times_{sf_name}.json")
    with open(out, "w") as f:
        json.dump({"sf": sf_name, "total_sec": round(sum(times.values()), 3),
                   "times": times}, f, indent=1, sort_keys=True)
    print(f"wrote {out} (total {sum(times.values()):.1f} s)")

if __name__ == "__main__":
    main()
