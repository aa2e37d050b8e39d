#!/usr/bin/env python3
"""DuckDB-side timing of the oracle suite — the baseline graft.Bench is
graded against.

Usage: python3 tools/duck_bench.py <sfDir> <oracleSqlJson> [passes]

Runs every oracle query from <oracleSqlJson> (a Verify output's
oracle_sql.json) against the sfDir parquet tables, [passes] times each
(default 3, interleaved by pass like graft.Bench so a host slow phase
degrades one sample of many queries), and prints ONE JSON line in
graft.Bench's shape: median `queries`/`total` plus min floors
(`queries_min`/`total_min`). Feed this and a BENCH_r*.json to
tools/bench_compare.py for the per-query ratio report.

Driver-side tooling only (duckdb is not a library dependency of the
engine): the measurement loop mirrors check_oracle.py's table setup so
both sides time the exact paired definitions.
"""
import json
import statistics
import sys
import time

import duckdb

from check_oracle import TABLES


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))
    names = sorted(oracles)
    samples = {n: [] for n in names}
    failed = set()
    for _ in range(passes):
        for n in names:
            if n in failed:
                continue
            t0 = time.perf_counter()
            try:
                con.execute(oracles[n]).fetchall()
            except Exception as e:
                # -1 marks a failed query (graft.Bench's convention, which
                # bench_compare.py's v >= 0 filter drops) — a silent fast
                # "timing" would read as a win
                print(f"-- FAIL {n}: {e}", file=sys.stderr)
                failed.add(n)
                continue
            samples[n].append(time.perf_counter() - t0)
    med = {n: (-1.0 if n in failed else statistics.median(s))
           for n, s in samples.items()}
    mn = {n: (-1.0 if n in failed else min(s)) for n, s in samples.items()}
    qs = ",".join(f'"{n}":{med[n]:.6f}' for n in names)
    qsm = ",".join(f'"{n}":{mn[n]:.6f}' for n in names)
    print(f'{{"metric":"total","value":{sum(med.values()):.6f},"unit":"sec",'
          f'"total_min":{sum(mn.values()):.6f},"queries":{{{qs}}},'
          f'"queries_min":{{{qsm}}},"sf":"{sf_dir}"}}')


if __name__ == "__main__":
    main()
