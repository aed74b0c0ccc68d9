import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import sys; sys.path.insert(0, "/root/repo")
from subphaser_tpu.ltr.classify import _batched_bottom_s_shared

def old_loop(sk, csks, sketch_s):
    C = len(csks); na = sk.size
    ja = np.arange(na, dtype=np.int64)
    shared = np.zeros(C, np.int64); s_v = np.empty(C, np.int64)
    for i, b in enumerate(csks):
        s = min(na, b.size, sketch_s); s_v[i] = s
        if s == 0 or b.size == 0: continue
        sa = np.searchsorted(b, sk)
        eq = b[np.minimum(sa, b.size - 1)] == sk
        dups_before = np.cumsum(eq) - eq
        urank = ja + sa - dups_before
        shared[i] = int((eq & (ja < s) & (sa < s) & (urank < s)).sum())
    return shared, s_v

rng = np.random.default_rng(0)
pool = np.unique(rng.integers(0, 1 << 62, 4000).astype(np.uint64))
sk = np.unique(rng.choice(pool, 700))[:512]
csks = [np.unique(rng.choice(pool, rng.integers(300, 900)))[:512] for _ in range(64)]
a = _batched_bottom_s_shared(sk, csks, 512)
b = old_loop(sk, csks, 512)
assert (a[0] == b[0]).all() and (a[1] == b[1]).all(), (a, b)
print("parity OK")
for name, fn in [("old_loop", old_loop), ("batched", _batched_bottom_s_shared)]:
    t0 = time.time(); n = 0
    while time.time() - t0 < 2.0:
        fn(sk, csks, 512); n += 1
    print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms/call ({n} calls)")
