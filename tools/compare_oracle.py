import duckdb, json, glob, sys
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['lineitem','orders','customer','nation','region','supplier','part','documents','embeddings','events']:
    con.execute(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        files = glob.glob(f'{out}/{name}/*.parquet')
        got = pd.concat([pq.read_table(f).to_pandas() for f in files]) if files else None
        if got is None:
            print(f'{name}: NO SPARK OUTPUT'); continue
        # driver-style: sort columns by name, sort rows, compare
        exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
        got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f'{name}: COLUMN MISMATCH exp={list(exp.columns)} got={list(got.columns)}'); continue
        if len(exp) != len(got):
            print(f'{name}: ROWCOUNT exp={len(exp)} got={len(got)}'); continue
        eq = True
        for c in exp.columns:
            a, b = exp[c], got[c]
            try:
                if not (a.astype(str).values == b.astype(str).values).all():
                    eq = False; print(f'{name}: VALUE MISMATCH col={c}')
                    mask = a.astype(str).values != b.astype(str).values
                    print('  exp:', a[mask].head(3).tolist(), ' got:', b[mask].head(3).tolist())
            except Exception as e:
                eq = False; print(f'{name}: compare error {c}: {e}')
        if eq: print(f'{name}: OK ({len(exp)} rows)')
    except Exception as e:
        print(f'{name}: ORACLE ERROR: {e}')
