"""Pure-CPU multiprocess probe: how much aggregate compute does this
guest actually deliver at 2/8/32 workers? (no Spark, no JVM)"""
import hashlib, os, sys, time
from multiprocessing import Process, Queue

def worker(q, seconds):
    t_end = time.monotonic() + seconds
    n = 0
    h = b"x" * 64
    while time.monotonic() < t_end:
        for _ in range(2000):
            h = hashlib.md5(h).digest()
        n += 2000
    q.put(n)

def run(nproc, seconds=6.0):
    q = Queue()
    ps = [Process(target=worker, args=(q, seconds)) for _ in range(nproc)]
    t0 = time.monotonic()
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    dt = time.monotonic() - t0
    return total / seconds

for n in (2, 8, 32):
    best = max(run(n) for _ in range(3))
    print(f"procs={n:2d} hashes/sec={best:,.0f}")
