"""ctypes bindings for the native host library (ltr/_native/native.cpp).

The .so is compiled on demand with g++ the first time it's needed, so the
package works from a source checkout without a build step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "native.cpp")
_SO = os.path.join(_DIR, "_native", "libsubphaser_native.so")
_ISA_TAG = _SO + ".isa"
_lock = threading.Lock()
_lib = None


def _host_isa_tag() -> str:
    """Fingerprint of the build host's ISA.

    The .so is built with -march=native; a binary carried to a host with a
    narrower ISA loads fine via CDLL but SIGILLs at first call, so the
    OSError-rebuild path never fires. We record the CPU feature flags at
    build time and rebuild when they change.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.platform()
    return hashlib.sha256(
        (platform.machine() + "|" + feats).encode()
    ).hexdigest()[:16]


class LtrParams(ctypes.Structure):
    _fields_ = [
        ("k", ctypes.c_int),
        ("minlenltr", ctypes.c_int),
        ("maxlenltr", ctypes.c_int),
        ("mindistltr", ctypes.c_int),
        ("maxdistltr", ctypes.c_int),
        ("similar", ctypes.c_double),
        ("mintsd", ctypes.c_int),
        ("maxtsd", ctypes.c_int),
        ("vic", ctypes.c_int),
        ("xdrop", ctypes.c_int),
        ("band", ctypes.c_int),
        ("max_gap", ctypes.c_int),
    ]


class LtrOut(ctypes.Structure):
    _fields_ = [
        ("start", ctypes.c_int32),
        ("end", ctypes.c_int32),
        ("lltr_len", ctypes.c_int32),
        ("rltr_len", ctypes.c_int32),
        ("similarity", ctypes.c_double),
        ("tsd_len", ctypes.c_int32),
    ]


class FinderOut(ctypes.Structure):
    _fields_ = [
        ("start", ctypes.c_int32),
        ("end", ctypes.c_int32),
        ("lltr_len", ctypes.c_int32),
        ("rltr_len", ctypes.c_int32),
        ("similarity", ctypes.c_double),
        ("tsd_len", ctypes.c_int32),
        ("score", ctypes.c_int32),
        ("flags", ctypes.c_int32),
        ("strand", ctypes.c_int32),
    ]


class ChainOut(ctypes.Structure):
    _fields_ = [
        ("q_start", ctypes.c_int64),
        ("q_end", ctypes.c_int64),
        ("t_start", ctypes.c_int64),
        ("t_end", ctypes.c_int64),
        ("n_anchors", ctypes.c_int32),
        ("strand", ctypes.c_int32),
        ("score", ctypes.c_double),
    ]


def _build() -> None:
    # -fopenmp: sp_build_cs parallelizes its independent gap alignments;
    # -march=native: the banded-DP row passes auto-vectorize (AVX2/512).
    # Fall back progressively on toolchains without either. Build to a
    # temp path and os.replace so processes holding the OLD .so mapped
    # keep their inode (g++ -o truncates in place otherwise).
    tmp = _SO + f".build{os.getpid()}"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
    for extra in (["-march=native", "-fopenmp"], ["-fopenmp"], []):
        r = subprocess.run(base + extra + ["-o", tmp, _SRC],
                           capture_output=True)
        if r.returncode == 0:
            os.replace(tmp, _SO)
            with open(_ISA_TAG, "w") as fh:
                fh.write(_host_isa_tag())
            return
    raise RuntimeError(
        "native build failed: " + r.stderr.decode(errors="replace")[-2000:]
    )


def load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if not stale:
            try:
                with open(_ISA_TAG) as fh:
                    stale = fh.read().strip() != _host_isa_tag()
            except OSError:
                stale = True  # no tag: built by an older version or foreign host
        if stale:
            _build()
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # stale/foreign-ABI artifact (e.g. checked out on another
            # platform): rebuild from source and retry once
            _build()
            lib = ctypes.CDLL(_SO)
        lib.sp_banded_identity.restype = ctypes.c_double
        lib.sp_banded_identity.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.sp_refine_ltr.restype = ctypes.c_int
        lib.sp_refine_ltr.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(LtrParams), ctypes.POINTER(LtrOut),
            ctypes.c_int64,
        ]
        lib.sp_finder_ltr.restype = ctypes.c_int
        lib.sp_finder_ltr.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(LtrParams), ctypes.c_int32,
            ctypes.POINTER(FinderOut), ctypes.c_int64,
        ]
        lib.sp_chain_anchors.restype = ctypes.c_int
        lib.sp_chain_anchors.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ChainOut), ctypes.c_int64,
        ]
        lib.sp_nj_tree.restype = ctypes.c_int
        lib.sp_nj_tree.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.sp_banded_align_ops.restype = ctypes.c_int
        lib.sp_banded_align_ops.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.sp_pack_body.restype = ctypes.c_int64
        lib.sp_pack_body.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sp_lis.restype = ctypes.c_int64
        lib.sp_lis.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sp_unpack_codes.restype = None
        lib.sp_unpack_codes.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.sp_profile_align.restype = ctypes.c_int
        lib.sp_profile_align.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.sp_build_cs.restype = ctypes.c_int64
        lib.sp_build_cs.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_LTR_FIELDS = {name for name, _t in LtrParams._fields_}


def _ltr_params(params: dict) -> LtrParams:
    """Build the C param struct, ignoring detector-level keys (e.g. the
    device seeding 'seed'/'min_score' params) the native layer doesn't take."""
    return LtrParams(**{k: v for k, v in params.items() if k in _LTR_FIELDS})


def banded_identity(a: np.ndarray, b: np.ndarray, band: int = 30) -> float:
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    return lib.sp_banded_identity(_u8ptr(a), a.size, _u8ptr(b), b.size, band)


def align_ops(a: np.ndarray, b: np.ndarray, band: int = 64) -> np.ndarray:
    """Banded global alignment of query ``a`` vs target ``b`` (uint8 codes)
    -> (n, 2) int32 array of (op, len) runs: 0 = diagonal, 1 = query-only
    (cs '+'), 2 = target-only (cs '-'). Used for PAF cs-string emission."""
    lib = load()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    cap = 2 * (a.size + b.size) + 16
    out = np.zeros(2 * cap, dtype=np.int32)
    n = lib.sp_banded_align_ops(
        _u8ptr(a), a.size, _u8ptr(b), b.size, band,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if n < 0:
        raise RuntimeError("sp_banded_align_ops failed (buffer/band)")
    return out[: 2 * n].reshape(n, 2)


def pack_body(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Raw FASTA record body (uint8, MAY contain newlines/CR) -> 2-bit
    packed words. One native pass replaces the strip-copy + LUT gather +
    shift/sum packing passes of the numpy path (io/encoding.pack_words).

    Returns (packed int32[ceil(nbases/16)], vmask int32[same], nbases).
    The GIL is released during the call, so per-chromosome packing
    parallelizes across host threads.
    """
    lib = load()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    cap_words = (raw.size + 15) // 16
    packed = np.zeros(max(cap_words, 1), dtype=np.int32)
    vmask = np.zeros(max(cap_words, 1), dtype=np.int32)
    n = lib.sp_pack_body(
        _u8ptr(raw), raw.size,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vmask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    n_words = max(-(-int(n) // 16), 0)
    if n_words < cap_words:
        packed = np.ascontiguousarray(packed[:n_words])
        vmask = np.ascontiguousarray(vmask[:n_words])
    return packed, vmask, int(n)


def build_cs_native(
    q: np.ndarray, t: np.ndarray, aq: np.ndarray, at: np.ndarray,
    qstart: int, qend: int, tstart: int, tend: int, k: int,
    minus: bool = False,
) -> tuple[str, int, int]:
    """cs:Z: text for one anchor-chained block -> (cs, nmatch, alen).

    One native call replaces the per-anchor Python loop of
    blocks/cs.build_cs (identical text; parity-tested)."""
    lib = load()
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    aq = np.ascontiguousarray(aq, dtype=np.int64)
    at = np.ascontiguousarray(at, dtype=np.int64)
    cap = 4 * (int(qend - qstart) + int(tend - tstart)) + 1024
    out = ctypes.create_string_buffer(cap)
    nmatch = ctypes.c_int64(0)
    alen = ctypes.c_int64(0)
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    n = lib.sp_build_cs(
        _u8ptr(q), q.size, _u8ptr(t), t.size,
        i64p(aq), i64p(at), aq.size,
        qstart, qend, tstart, tend, k, 1 if minus else 0,
        out, cap, ctypes.byref(nmatch), ctypes.byref(alen),
    )
    if n < 0:
        raise RuntimeError("sp_build_cs: output buffer too small")
    return out.value.decode(), int(nmatch.value), int(alen.value)


def unpack_codes(packed: np.ndarray, vmask: np.ndarray, n_bases: int
                 ) -> np.ndarray:
    """2-bit packed words -> uint8 base codes (0..3, 4 = N), one native
    pass (the numpy broadcast unpack cost ~6 s per 26 Mb chromosome)."""
    lib = load()
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    vmask = np.ascontiguousarray(vmask, dtype=np.int32)
    out = np.empty(max(n_bases, 1), dtype=np.uint8)
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))  # noqa: E731
    lib.sp_unpack_codes(i32p(packed), i32p(vmask), packed.size, n_bases,
                        _u8ptr(out))
    return out[:n_bases]


def profile_align(p1: np.ndarray, sp2: np.ndarray,
                  gap_open: float = 11.0, gap_ext: float = 1.0) -> np.ndarray:
    """Global affine-gap alignment of two peptide profiles (progressive-MSA
    merge; replaces the reference's mafft call, LTR.py:144-299).

    ``p1``: (L1, 21) float32 column frequencies. ``sp2``: (L2, 21) float32 =
    profile-2 frequencies premultiplied by the substitution matrix
    (``f2 @ S.T``). Returns (n, 2) int32 (op, len) runs: 0 = aligned column
    pair, 1 = column from profile 1 only, 2 = from profile 2 only."""
    lib = load()
    p1 = np.ascontiguousarray(p1, dtype=np.float32)
    sp2 = np.ascontiguousarray(sp2, dtype=np.float32)
    l1, l2 = p1.shape[0], sp2.shape[0]
    cap = 2 * (l1 + l2) + 16
    out = np.zeros(2 * cap, dtype=np.int32)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))  # noqa: E731
    n = lib.sp_profile_align(
        fptr(p1), l1, fptr(sp2), l2,
        ctypes.c_float(gap_open), ctypes.c_float(gap_ext),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if n < 0:
        raise RuntimeError("sp_profile_align: ops buffer too small")
    return out[: 2 * n].reshape(n, 2)


def lis_indices(t: np.ndarray) -> np.ndarray:
    """Indices of the longest strictly-increasing subsequence of ``t``
    (int64; input order = (q, t)-sorted anchors)."""
    lib = load()
    t = np.ascontiguousarray(t, dtype=np.int64)
    out = np.zeros(max(t.size, 1), dtype=np.int64)
    n = lib.sp_lis(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), t.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]


def refine_ltr(seq_codes: np.ndarray, seed_i: np.ndarray, seed_j: np.ndarray,
               params: dict, out_cap: int = 1 << 16) -> np.ndarray:
    """seq_codes: uint8 (0..3, >=4 N). Returns structured array of candidates."""
    lib = load()
    seq = np.ascontiguousarray(seq_codes, dtype=np.uint8)
    si = np.ascontiguousarray(seed_i, dtype=np.int32)
    sj = np.ascontiguousarray(seed_j, dtype=np.int32)
    prm = _ltr_params(params)
    out = (LtrOut * out_cap)()
    n = lib.sp_refine_ltr(
        _u8ptr(seq), seq.size,
        si.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        si.size, ctypes.byref(prm), out, out_cap,
    )
    dtype = np.dtype(
        [("start", np.int32), ("end", np.int32), ("lltr_len", np.int32),
         ("rltr_len", np.int32), ("similarity", np.float64), ("tsd_len", np.int32)]
    )
    res = np.zeros(n, dtype=dtype)
    for i in range(n):
        res[i] = (out[i].start, out[i].end, out[i].lltr_len, out[i].rltr_len,
                  out[i].similarity, out[i].tsd_len)
    return res


def finder_ltr(seq_codes: np.ndarray, ls: np.ndarray, le: np.ndarray,
               rs: np.ndarray, re: np.ndarray, params: dict,
               min_score: int = 2, out_cap: int = 1 << 16) -> np.ndarray:
    """ltr_finder-style structural refinement of chained candidate spans.

    Each candidate is a colinear seed chain: left copy [ls, le), right copy
    [rs, re). Returns a structured array with the signals the reference's
    LTRFinderRecord carries (TSD/PBS/PPT/strand/score, LTR.py:715-725)."""
    lib = load()
    seq = np.ascontiguousarray(seq_codes, dtype=np.uint8)
    a_ls = np.ascontiguousarray(ls, dtype=np.int64)
    a_le = np.ascontiguousarray(le, dtype=np.int64)
    a_rs = np.ascontiguousarray(rs, dtype=np.int64)
    a_re = np.ascontiguousarray(re, dtype=np.int64)
    prm = _ltr_params(params)
    out = (FinderOut * out_cap)()
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    n = lib.sp_finder_ltr(
        _u8ptr(seq), seq.size, i64p(a_ls), i64p(a_le), i64p(a_rs), i64p(a_re),
        a_ls.size, ctypes.byref(prm), min_score, out, out_cap,
    )
    dtype = np.dtype(
        [("start", np.int32), ("end", np.int32), ("lltr_len", np.int32),
         ("rltr_len", np.int32), ("similarity", np.float64),
         ("tsd_len", np.int32), ("score", np.int32), ("flags", np.int32),
         ("strand", np.int32)]
    )
    res = np.zeros(n, dtype=dtype)
    for i in range(n):
        res[i] = (out[i].start, out[i].end, out[i].lltr_len, out[i].rltr_len,
                  out[i].similarity, out[i].tsd_len, out[i].score,
                  out[i].flags, out[i].strand)
    return res


def chain_anchors(qpos: np.ndarray, tpos: np.ndarray, alen: np.ndarray,
                  strand: int, max_gap: int = 10000, min_chain_len: int = 5000,
                  min_chain_anchors: int = 5, out_cap: int = 1 << 16) -> np.ndarray:
    lib = load()
    q = np.ascontiguousarray(qpos, dtype=np.int64)
    t = np.ascontiguousarray(tpos, dtype=np.int64)
    a = np.ascontiguousarray(alen, dtype=np.int32)
    out = (ChainOut * out_cap)()
    n = lib.sp_chain_anchors(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        q.size, strand, max_gap, min_chain_len, min_chain_anchors, out, out_cap,
    )
    dtype = np.dtype(
        [("q_start", np.int64), ("q_end", np.int64), ("t_start", np.int64),
         ("t_end", np.int64), ("n_anchors", np.int32), ("strand", np.int32),
         ("score", np.float64)]
    )
    res = np.zeros(n, dtype=dtype)
    for i in range(n):
        res[i] = (out[i].q_start, out[i].q_end, out[i].t_start, out[i].t_end,
                  out[i].n_anchors, out[i].strand, out[i].score)
    return res


def nj_tree(dist: np.ndarray, names: list[str]) -> str:
    lib = load()
    n = len(names)
    d = np.ascontiguousarray(dist, dtype=np.float64)
    blob = b"".join(name.encode() + b"\0" for name in names)
    cap = 1 << 22
    out = ctypes.create_string_buffer(cap)
    r = lib.sp_nj_tree(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, blob, out, cap
    )
    if r < 0:
        raise RuntimeError(f"sp_nj_tree failed: {r}")
    return out.value.decode()
