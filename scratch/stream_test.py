import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/scratch/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import clickhouse_tpu as ch
s = ch.connect()
s.execute("CREATE TABLE big (x Int64)")
for ci in range(4):
    s.insert_pydict("big", {"x": np.load(f"/root/repo/scratch/bench_data/big_x_{ci}.npy")})
print("table ready", flush=True)
t0 = time.time()
r = s.execute("SELECT count() FROM big WHERE x > 500000 SETTINGS stream_readers = 2")
print("Q5 1B:", time.time()-t0, "s", r.rows(), flush=True)
t0 = time.time()
r = s.execute("SELECT count() FROM big WHERE x > 500000 SETTINGS stream_readers = 2")
print("Q5 warm:", time.time()-t0, "s", flush=True)
t0 = time.time()
r = s.execute("SELECT x % 1024 AS k, count() AS c, sum(x) FROM big GROUP BY k ORDER BY c DESC LIMIT 10 SETTINGS stream_readers = 2")
print("Q5b:", time.time()-t0, "s", r.rows()[:2], flush=True)
