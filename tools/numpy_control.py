"""Pure-numpy 2-vs-8 control: the box's achievable scaling ceiling.

Runs K identical argsort tasks through a bare Ray task pool at
num_cpus=2 and num_cpus=8 in fresh processes (same protocol as the
engine's scaling bench, no Ray Data, no shuffle) — any efficiency
loss here is memory-bandwidth saturation, not engine design.
"""
import json, os, subprocess, sys, time

CHILD = r'''
import os, sys, time
import numpy as np
import ray
cpus = int(sys.argv[1])
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
@ray.remote
def work(seed):
    rng = np.random.default_rng(seed)
    a = rng.random(2_000_000)
    for _ in range(3):
        a = a[np.argsort(a, kind="stable")]
    return float(a[0])
ray.get([work.remote(i) for i in range(8)])   # warm workers (untimed)
t0 = time.perf_counter()
ray.get([work.remote(100 + i) for i in range(32)])
print(time.perf_counter() - t0)
ray.shutdown()
'''

def run(cpus):
    out = subprocess.run([sys.executable, "-c", CHILD, str(cpus)],
                         capture_output=True, text=True, timeout=600)
    return float(out.stdout.strip().splitlines()[-1])

rounds = []
for i in range(int(os.environ.get("ROUNDS", "5"))):
    w2 = run(2); w8 = run(8)
    eff = (w2 / w8) / 4
    rounds.append({"sec_2": round(w2, 2), "sec_8": round(w8, 2),
                   "eff": round(eff, 3)})
    print(json.dumps(rounds[-1]), flush=True)
effs = sorted(r["eff"] for r in rounds)
print("median control efficiency:", effs[len(effs)//2])
