"""Device trace of the full production GBA solve (mk/Pallas path)."""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")
import jax

from bench import build_problem
from multiagent_orb_slam2_tpu.optim.ba import ba_solve_fast

prob, cam = build_problem()


def solve():
    return ba_solve_fast(prob, cam, n_iters=10, chunk=4096,
                         check_overflow=False)


res = solve()
print("warmup cost:", float(res.cost), flush=True)
t0 = time.perf_counter()
res = solve()
_ = float(res.cost)
print(f"steady: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

with jax.profiler.trace("/tmp/jaxtrace2"):
    res = solve()
    _ = float(res.cost)

files = sorted(glob.glob("/tmp/jaxtrace2/**/*.trace.json.gz", recursive=True))
agg = defaultdict(float)
cnt = defaultdict(int)
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
for ev in tr.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        agg[ev.get("name", "")] += ev["dur"]
        cnt[ev.get("name", "")] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
with open("/tmp/trace2_rows.txt", "w") as f:
    for name, us in rows:
        f.write(f"{us/1000:9.3f} ms  x{cnt[name]:5d}  {name}\n")
for name, us in rows[:40]:
    print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:100]}")
print("full dump: /tmp/trace2_rows.txt")
