import multiprocessing as mp, time, numpy as np, sys
TOTAL_GB = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NW = 4
PER = TOTAL_GB // NW
def touch(i, barrier, counter):
    held = []
    t0 = time.perf_counter()
    for j in range(PER):
        held.append(np.ones(1 << 30, np.uint8))
        with counter.get_lock():
            counter.value += 1
            print(f"[{time.perf_counter()-t0:.0f}s] held {counter.value} GB total", flush=True)
    barrier.wait()
if __name__ == "__main__":
    barrier = mp.Barrier(NW)
    counter = mp.Value('i', 0)
    procs = [mp.Process(target=touch, args=(i, barrier, counter))
             for i in range(NW)]
    t0 = time.perf_counter()
    for p in procs: p.start()
    for p in procs: p.join()
    print(f"[{time.perf_counter()-t0:.0f}s] ALL {TOTAL_GB} GB held+released", flush=True)
