#!/usr/bin/env python3
"""Replay every oracle SQL from a graft.Verify dump in DuckDB and compare
against the dumped parquet — the same check the driver's correctness gate
performs. Usage: oracle_replay.py <sfDir> <verifyOutDir>

Driver-side tooling only (duckdb/pyarrow/pandas); the Scala library does
not depend on it.
"""
import sys, glob, json
import duckdb
import pyarrow.parquet as pq

def main(sf, out):
    con = duckdb.connect()
    for p in glob.glob(f'{sf}/*.parquet'):
        name = p.split('/')[-1].replace('.parquet', '')
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = pq.read_table(f'{out}/{name}').to_pandas()
            got = con.execute(sql).df()
            cols = sorted(exp.columns)
            assert sorted(got.columns) == cols, \
                f'schema {sorted(got.columns)} vs {cols}'
            e = exp[cols].sort_values(cols).reset_index(drop=True)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                if e[c].dtype != g[c].dtype:
                    g[c] = g[c].astype(e[c].dtype)
            if not e.equals(g):
                fails.append(name)
                print(f'{name}: MISMATCH spark={len(e)} duck={len(g)}')
        except Exception as ex:
            fails.append(name)
            print(f'{name}: ERROR {str(ex)[:200]}')
    print(f'checked {len(oracle)} queries; FAILS: {fails}')
    return 1 if fails else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
