#!/usr/bin/env python3
"""Time only the oracle queries MISSING from an existing
oracle_times_<sf>.json and merge them in — lets a long full regen
(tools/bench_oracle.py) be topped up with late-added queries without
re-running the multi-hundred-second oracles.

Usage: python3 tools/merge_oracle_times.py <sfDir> <verifyOutDir>
"""
import sys, os, json, time
import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"oracle_times_{sf_name}.json")
    with open(path) as f:
        doc = json.load(f)
    missing = sorted(set(oracles) - set(doc["times"]))
    if not missing:
        print("nothing missing")
        return
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name in missing:
        t0 = time.monotonic()
        con.execute(oracles[name]).fetchall()
        doc["times"][name] = round(time.monotonic() - t0, 3)
        print(f"  {name}: {doc['times'][name]} s", flush=True)
    doc["total_sec"] = round(sum(doc["times"].values()), 3)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"merged {len(missing)} into {path} (total {doc['total_sec']:.1f} s)")


if __name__ == "__main__":
    main()
