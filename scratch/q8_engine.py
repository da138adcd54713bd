import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/scratch/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import clickhouse_tpu as ch
s = ch.connect()
NV, DV = 10_000_000, 128
V8 = np.load("/root/repo/scratch/bench_data/vecs_10m.npy")
s.execute("CREATE TABLE vecs (id Int64, v Array(Float32))")
s.insert_pydict("vecs", {"id": np.arange(NV, dtype=np.int64), "v": V8})
q8 = np.random.default_rng(9).normal(size=DV).astype(np.float32)
qs8 = "CAST([" + ",".join(f"{x:.5f}" for x in q8) + "] AS Array(Float32))"
def t(sql, reps=5):
    s.execute(sql)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); s.execute(sql); ts.append(time.perf_counter()-t0)
    print(f"{min(ts)*1e3:8.1f} ms  {sql[:70]}", flush=True)
t(f"SELECT max(cosineDistance(v, {qs8})) FROM vecs")
t(f"SELECT id FROM vecs ORDER BY cosineDistance(v, {qs8}) LIMIT 10")
t("SELECT max(id) FROM vecs")
