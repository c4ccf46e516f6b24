#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check.py <sfDir> <verifyOutDir>

For each <name> subdir (parquet written by graft.Verify) with an entry in
oracle_sql.json: register the sfDir tables in DuckDB, run the oracle SQL,
and compare schema (sorted column names + types) and values (exact,
row-by-row in emitted order AND order-insensitively).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

def canon_type(t):
    t = str(t).lower()
    aliases = {
        'int64': 'long', 'bigint': 'long',
        'int32': 'int', 'int': 'int', 'integer': 'int',
        'double': 'double', 'float64': 'double',
        'float': 'float', 'float32': 'float',
        'string': 'string', 'varchar': 'string', 'large_string': 'string',
        'bool': 'bool', 'boolean': 'bool',
        'date32[day]': 'date', 'date': 'date',
    }
    if t.startswith('timestamp'): return 'timestamp'
    if t.startswith('decimal'): return t
    if t.startswith('list'): return 'list'
    return aliases.get(t, t)

def canon_val(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return 'NaN'
        return v
    return v

def main(sf_dir, out_dir):
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
    con = duckdb.connect()
    for tbl in ['region','nation','customer','supplier','part','orders',
                'lineitem','events','documents','embeddings']:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f'{out_dir}/{name}/*.parquet')
        if not files:
            results[name] = 'MISSING-SPARK-OUTPUT'
            continue
        try:
            spark_tbl = pq.read_table(files[0])
        except Exception as e:
            results[name] = f'READ-FAIL {e}'
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f'ORACLE-FAIL {str(e)[:200]}'
            continue
        problems = []
        # Mirror the DRIVER harness's limitation: it sorts rows with
        # pandas sort_values over all columns and crashes on list values
        # (round-11 e07/e09/t21 regression). Flag array outputs HERE so a
        # locally-green gate can't ship driver-red.
        for f in spark_tbl.schema:
            if str(f.type).startswith(('list', 'large_list', 'fixed_size_list', 'struct', 'map')):
                problems.append(f'ARRAY-OUTPUT[{f.name}] (driver harness cannot sort)')
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            problems.append(f'cols spark={s_cols} duck={d_cols}')
        else:
            for c in s_cols:
                st = canon_type(spark_tbl.schema.field(c).type)
                dt = canon_type(duck.schema.field(c).type)
                if st != dt:
                    problems.append(f'type[{c}] spark={st} duck={dt}')
        if spark_tbl.num_rows != duck.num_rows:
            problems.append(f'rows spark={spark_tbl.num_rows} duck={duck.num_rows}')
        if not problems:
            sp = [tuple(canon_val(v) for v in row)
                  for row in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])]
            dk = [tuple(canon_val(v) for v in row)
                  for row in zip(*[duck.column(c).to_pylist() for c in s_cols])]
            if sp != dk:
                if sorted(map(repr, sp)) == sorted(map(repr, dk)):
                    problems.append('ROW-ORDER-ONLY mismatch')
                else:
                    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sp, dk)) if a != b]
                    problems.append(f'{len(diffs)} value diffs; first: {diffs[:2]}')
        results[name] = 'OK' if not problems else '; '.join(problems)
    n_ok = sum(1 for v in results.values() if v == 'OK')
    for name, r in results.items():
        mark = '✓' if r == 'OK' else '✗'
        print(f'{mark} {name}: {r}')
    print(f'== {n_ok}/{len(results)} OK ==')
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
