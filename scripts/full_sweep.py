import ray, json, time
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
import logging; logging.getLogger("ray.data").setLevel(logging.ERROR)
from reconcile_curation_in_cris_systems_ray.config import tune_data_context
tune_data_context()
import duckdb, pandas as pd, hashlib, os
import __ray_entry__ as e
Q, O = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]): df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
results = {}
for name in sorted(O):
    t0 = time.time()
    try:
        res = Q[name](sf)
        if hasattr(res, "to_pandas"): res = res.to_pandas()
        odf = con.execute(O[name]).fetchdf()
        a, b = canon(res), canon(odf)
        ok = a.shape == b.shape and list(a.columns) == list(b.columns) and a.equals(b)
        results[name] = {"ok": bool(ok), "rows": len(a), "oracle_rows": len(b),
                         "sec": round(time.time()-t0, 1)}
    except Exception as exc:
        results[name] = {"ok": False, "err": str(exc)[:200],
                         "sec": round(time.time()-t0, 1)}
    print(name, json.dumps(results[name]), flush=True)
bad = [k for k, v in results.items() if not v["ok"]]
print("SWEEP_DONE", len(results), "queries,", len(bad), "failures:", bad, flush=True)
ray.shutdown()
