import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
sys.path.insert(0, "/root/repo")
from subphaser_tpu.ltr.classify import Classification, classify_pass2
rng = np.random.default_rng(0)
BASES = np.frombuffer(b"ACGT", np.uint8)
def rand_seq(n): return rng.integers(0, 4, n, np.uint8)
def mutate(a, rate):
    b = a.copy(); m = rng.random(a.size) < rate
    b[m] = (b[m] + rng.integers(1, 4, int(m.sum()), np.uint8)) % 4
    return b
def to_str(a): return BASES[a].tobytes().decode()
families = [rand_seq(8000) for _ in range(12)]
elements, d_class = [], {}
i = 0
for fi, fam in enumerate(families):
    for m in range(300):
        eid = f"e{i}"; i += 1
        elements.append((eid, to_str(mutate(fam, 0.05))))
        d_class[eid] = (Classification(id=eid, order="LTR", superfamily="Copia",
            clade=f"C{fi}", completed="yes", strand="+") if m < 210
            else Classification(id=eid))
import concurrent.futures as cf, unittest.mock as um
class Ser:
    def __init__(self, *a, **k): pass
    def __enter__(self): return self
    def __exit__(self, *a): pass
    def map(self, fn, items, chunksize=1): return (fn(x) for x in items)
for name, ctx in [("production", Ser)]:
    dd = dict(d_class)
    if ctx is None:
        t0=time.time(); out = classify_pass2(elements, dd); dt=time.time()-t0
    else:
        with um.patch("concurrent.futures.ThreadPoolExecutor", ctx):
            t0=time.time(); out = classify_pass2(elements, dd); dt=time.time()-t0
    nt = sum(1 for e,_ in elements if d_class[e].order is None and out[e].order is not None)
    print(f"{name}: {dt:.1f}s = {1080/dt:.0f} q/s, transferred {nt}")
