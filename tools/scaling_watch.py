"""Calm-window scaling-round collector (the round-4 measurement protocol).

Samples hypervisor steal over 5 s; when the host is calm (< CALM_TICKS
steal ticks) runs ONE interleaved `bench.py --scaling` round (fresh
ray.init at each parallelism level) and appends the result + the steal
measured ACROSS the round to a jsonl.  Every round is recorded; the
a-priori clean-window rule (both walls within 1.5x the session best)
is applied at aggregation time, never at collection time.

Usage:  GRAFT_WATCH_ROUNDS=16 python tools/scaling_watch.py
"""
import json, os, subprocess, sys, time

REPO = "/root/repo"
OUT = os.environ.get("GRAFT_WATCH_OUT", "/root/repo/scaling_rounds.jsonl")
TARGET_ROUNDS = int(os.environ.get("GRAFT_WATCH_ROUNDS", "16"))
MAX_WALL = 3.2 * 3600
CALM_TICKS = 80


def steal_sample(dt=5.0):
    t = open("/proc/stat").readline().split()
    u0, s0 = int(t[1]), int(t[8])
    time.sleep(dt)
    t = open("/proc/stat").readline().split()
    return int(t[1]) - u0, int(t[8]) - s0


def main():
    t_start = time.time()
    done = sum(1 for _ in open(OUT)) if os.path.exists(OUT) else 0
    while done < TARGET_ROUNDS and time.time() - t_start < MAX_WALL:
        u, s = steal_sample()
        if s > CALM_TICKS:
            print(f"[watch] storm (steal {s}/5s) — waiting", flush=True)
            time.sleep(45)
            continue
        print(f"[watch] calm (steal {s}/5s) — running round {done}", flush=True)
        t = open("/proc/stat").readline().split()
        u0, s0 = int(t[1]), int(t[8])
        env = dict(os.environ, GRAFT_SCALING_TRIALS="1",
                   GRAFT_SCALING_LEVELS="2,8")
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                env=env, capture_output=True, text=True, timeout=900,
                cwd=REPO).stdout
            d = json.loads(out.strip().splitlines()[-1])
        except Exception as exc:
            print(f"[watch] round failed: {exc}", flush=True)
            time.sleep(30)
            continue
        t = open("/proc/stat").readline().split()
        d["round_wall"] = round(time.time() - t0, 1)
        d["steal_ticks"] = int(t[8]) - s0
        d["user_ticks"] = int(t[1]) - u0
        d["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(d) + "\n")
        done += 1
    print("[watch] done", flush=True)


main()
