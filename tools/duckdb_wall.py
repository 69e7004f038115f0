#!/usr/bin/env python3
"""Same-session DuckDB wall for the 2x gate (round-7 verdict item 3).

Runs every oracle SQL from a JSON file ({name: sql}) against the sf
parquet tables and prints ONE stdout line: "<total_seconds> <n_failed>"
(per-query timings go to stderr for debugging — the caller discards
them). Invoked by graft.Bench immediately after the Spark timed pass so
the (spark_oracle_subset, duckdb_wall) pair is measured under the SAME
host weather — the gate stops depending on a cross-round quiet-host
memory. n_failed is on stdout so the caller can flag a pair where the
two sides ran different query sets (a failing oracle is excluded from
the DuckDB total but its Spark time still counts).

This is measurement harness, not engine code: the Spark library has no
DuckDB dependency; Bench shells out and skips gracefully when python3
or duckdb is absent.

Usage: python3 tools/duckdb_wall.py <sfDir> <oracle_sql.json> [threads]
"""
import sys, json, os, time

def main(sf_dir, oracle_path, threads="32"):
    import duckdb
    con = duckdb.connect()
    # mirror the Spark side's parallelism (Bench passes SPARK_GRAFT_CPUS)
    con.execute(f"PRAGMA threads={int(threads)}")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    per = {}
    total = 0.0
    failed = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()  # materialize fully, like Spark's digest
            dt = time.time() - t0
        except Exception as e:
            dt = -(time.time() - t0)  # failures negated, same as Bench
            failed += 1
            print(f"FAIL {name}: {e}", file=sys.stderr)
        per[name] = round(dt, 3)
        if dt > 0:
            total += dt
    print(json.dumps(per), file=sys.stderr)
    # per-query walls on stdout too (r12): the caller pairs each Spark
    # query against ITS DuckDB wall so one >2x row can't hide under a
    # passing aggregate ratio. Line order contract: PERQ first, the
    # "<total> <n_failed>" line LAST (older parsers read the last line).
    print("PERQ " + json.dumps(per))
    print(f"{total:.3f} {failed}")

if __name__ == "__main__":
    main(*sys.argv[1:4])
