"""Memory-BANDWIDTH probe: per-process 256MB array sweeps (far beyond
LLC) at 2/8/32 workers — does aggregate bandwidth scale?"""
import numpy as np, time
from multiprocessing import Process, Queue

def worker(q, seconds):
    a = np.ones(32_000_000, dtype=np.float64)  # 256 MB
    t_end = time.monotonic() + seconds
    n = 0
    while time.monotonic() < t_end:
        s = float(a.sum())  # streams 256MB through the core
        n += 1
    q.put(n * a.nbytes)

def run(nproc, seconds=6.0):
    q = Queue()
    ps = [Process(target=worker, args=(q, seconds)) for _ in range(nproc)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total / seconds / 1e9

for n in (2, 8, 32):
    best = max(run(n) for _ in range(2))
    print(f"procs={n:2d} aggregate_read_GB/s={best:,.1f}")
