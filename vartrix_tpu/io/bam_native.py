"""ctypes wrapper for libgenomio (native/genomio.cpp): whole-BAM parallel
decode into columnar NumPy arrays.

This is the performance host path: one call decodes BGZF + all records
into structure-of-arrays buffers (positions, flags, decoded sequences,
aligned-reference intervals, CB/UB tag values) that the vectorized
pipeline consumes. Validated record-for-record against the pure-Python
reader (io/bam.py) in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native", "libgenomio.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    script = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build.sh")
    subprocess.run(["bash", script], check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        vp = ctypes.c_void_p
        lib.gio_bam_load.restype = vp
        lib.gio_bam_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        try:  # region loader (absent in pre-existing .so builds)
            lib.gio_bam_load_regions.restype = vp
            lib.gio_bam_load_regions.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        except AttributeError:
            pass
        try:  # streaming whole-file loader
            lib.gio_bam_load_stream.restype = vp
            lib.gio_bam_load_stream.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_int64]
        except AttributeError:
            pass
        try:  # raw in-memory BAM stream loader (native CRAM path)
            lib.gio_bam_load_bytes.restype = vp
            lib.gio_bam_load_bytes.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int]
        except AttributeError:
            pass
        lib.gio_bam_free.argtypes = [vp]
        lib.gio_bam_error.restype = ctypes.c_char_p
        lib.gio_bam_error.argtypes = [vp]
        lib.gio_bam_n_records.restype = ctypes.c_int64
        lib.gio_bam_n_records.argtypes = [vp]
        lib.gio_bam_n_refs.restype = ctypes.c_int32
        lib.gio_bam_n_refs.argtypes = [vp]
        lib.gio_bam_ref_name.restype = ctypes.c_char_p
        lib.gio_bam_ref_name.argtypes = [vp, ctypes.c_int32]
        lib.gio_bam_ref_len.restype = ctypes.c_int32
        lib.gio_bam_ref_len.argtypes = [vp, ctypes.c_int32]
        ptr_specs = {
            "gio_bam_tid": ctypes.c_int32, "gio_bam_pos": ctypes.c_int32,
            "gio_bam_ref_end": ctypes.c_int32, "gio_bam_mapq": ctypes.c_uint8,
            "gio_bam_flag": ctypes.c_uint16, "gio_bam_seq_off": ctypes.c_int64,
            "gio_bam_seq_pool": ctypes.c_uint8, "gio_bam_itv_off": ctypes.c_int64,
            "gio_bam_itv_pool": ctypes.c_int32, "gio_bam_cb_off": ctypes.c_int64,
            "gio_bam_cb_pool": ctypes.c_uint8, "gio_bam_ub_off": ctypes.c_int64,
            "gio_bam_ub_pool": ctypes.c_uint8,
        }
        for name, ct in ptr_specs.items():
            getattr(lib, name).restype = ctypes.POINTER(ct)
            getattr(lib, name).argtypes = [vp]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        try:  # absent in pre-existing .so builds; callers fall back to numpy
            lib.gio_gather_padded.restype = None
            lib.gio_gather_padded.argtypes = [
                u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, u8p,
                ctypes.c_int]
        except AttributeError:
            pass
        i32p_ = ctypes.POINTER(ctypes.c_int32)
        try:
            lib.gio_gather_padded_packed.restype = ctypes.c_int32
            lib.gio_gather_padded_packed.argtypes = [
                u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, u8p,
                i32p_, ctypes.c_int]
        except AttributeError:
            pass
        try:
            lib.gio_gather_padded_packed2.restype = ctypes.c_int32
            lib.gio_gather_padded_packed2.argtypes = [
                u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int32, u8p,
                i32p_, ctypes.c_int]
        except AttributeError:
            pass
        try:
            lib.gio_tag_lookup.restype = None
            lib.gio_tag_lookup.argtypes = [
                u8p, i64p, ctypes.c_int64, u8p, i64p, ctypes.c_int64,
                i32p_, ctypes.c_int32, i32p_, ctypes.c_int]
            lib.gio_tag_ids.restype = None
            lib.gio_tag_ids.argtypes = [u8p, i64p, ctypes.c_int64, i64p,
                                        ctypes.c_int]
        except AttributeError:
            pass
        try:
            lib.gio_mtx_format.restype = vp
            lib.gio_mtx_format.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                           ctypes.c_int]
            lib.gio_buf_data.restype = ctypes.c_void_p
            lib.gio_buf_data.argtypes = [vp]
            lib.gio_buf_len.restype = ctypes.c_int64
            lib.gio_buf_len.argtypes = [vp]
            lib.gio_buf_free.argtypes = [vp]
            lib.gio_mtx_parse.restype = ctypes.c_int64
            lib.gio_mtx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                          ctypes.c_int64, i64p, i64p, f64p,
                                          ctypes.c_int]
        except AttributeError:
            pass
        _lib = lib
    return _lib


def mtx_format_native(rows1: np.ndarray, cols1: np.ndarray,
                      vals: np.ndarray, n_threads: int = 0) -> Optional[bytes]:
    """Format 'row col value' body lines natively (indices already
    1-based); None when the library predates the symbol."""
    lib = get_lib()
    if not hasattr(lib, "gio_mtx_format"):
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    r = np.ascontiguousarray(rows1, dtype=np.int64)
    c = np.ascontiguousarray(cols1, dtype=np.int64)
    v = np.ascontiguousarray(vals, dtype=np.float64)
    h = lib.gio_mtx_format(r.ctypes.data_as(i64p), c.ctypes.data_as(i64p),
                           v.ctypes.data_as(f64p), ctypes.c_int64(len(r)),
                           ctypes.c_int(n_threads))
    try:
        n = lib.gio_buf_len(h)
        return ctypes.string_at(lib.gio_buf_data(h), n) if n else b""
    finally:
        lib.gio_buf_free(h)


def mtx_parse_native(body: bytes, nnz: int, n_threads: int = 0):
    """Parse nnz 'row col value' lines natively -> (rows1, cols1, vals)
    with 1-based indices, or None when unavailable. Raises ValueError on
    non-integer indices (same condition the Python parser rejects)."""
    lib = get_lib()
    if not hasattr(lib, "gio_mtx_parse"):
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    got = lib.gio_mtx_parse(body, ctypes.c_int64(len(body)),
                            ctypes.c_int64(nnz),
                            rows.ctypes.data_as(i64p),
                            cols.ctypes.data_as(i64p),
                            vals.ctypes.data_as(f64p),
                            ctypes.c_int(n_threads))
    if got == -2:
        raise ValueError("non-integer matrix indices")
    if got < 0:
        return None  # malformed for the native parser; let Python decide
    if got < nnz:
        raise ValueError(f"expected {nnz} 'row col value' lines, got {got}")
    return rows, cols, vals


def gather_padded(seq_pool: np.ndarray, seq_off: np.ndarray,
                  read_ids: np.ndarray, lx: int,
                  n_threads: int = 0) -> Optional[np.ndarray]:
    """Threaded native [n, lx] uint8 padded gather (pad byte 0); returns
    None when the loaded library predates the symbol."""
    lib = get_lib()
    if not hasattr(lib, "gio_gather_padded"):
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    read_ids = np.ascontiguousarray(read_ids, dtype=np.int64)
    out = np.empty((len(read_ids), lx), dtype=np.uint8)
    if len(read_ids) == 0:
        return out
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    pool = np.ascontiguousarray(seq_pool, dtype=np.uint8)
    off = np.ascontiguousarray(seq_off, dtype=np.int64)
    lib.gio_gather_padded(
        pool.ctypes.data_as(u8p), off.ctypes.data_as(i64p),
        read_ids.ctypes.data_as(i64p), ctypes.c_int64(len(read_ids)),
        ctypes.c_int32(lx), out.ctypes.data_as(u8p),
        ctypes.c_int(n_threads))
    return out


def gather_padded_packed(seq_pool: np.ndarray, seq_off: np.ndarray,
                         read_ids: np.ndarray, lx: int,
                         n_threads: int = 0):
    """Threaded native packed gather: ([n, lx//2] uint8 4-bit codes, two
    bases per byte high-nibble first, [n] int32 lengths) — or None when
    unavailable, lx is odd, or a pool byte falls outside the BAM
    16-symbol alphabet (caller falls back to the unpacked path)."""
    lib = get_lib()
    if not hasattr(lib, "gio_gather_padded_packed") or lx % 2:
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    read_ids = np.ascontiguousarray(read_ids, dtype=np.int64)
    out = np.empty((len(read_ids), lx // 2), dtype=np.uint8)
    lens = np.empty(len(read_ids), dtype=np.int32)
    if len(read_ids) == 0:
        return out, lens
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    pool = np.ascontiguousarray(seq_pool, dtype=np.uint8)
    off = np.ascontiguousarray(seq_off, dtype=np.int64)
    rc = lib.gio_gather_padded_packed(
        pool.ctypes.data_as(u8p), off.ctypes.data_as(i64p),
        read_ids.ctypes.data_as(i64p), ctypes.c_int64(len(read_ids)),
        ctypes.c_int32(lx), out.ctypes.data_as(u8p),
        lens.ctypes.data_as(i32p), ctypes.c_int(n_threads))
    if rc != 0:
        return None
    return out, lens


def gather_padded_packed2(seq_pool: np.ndarray, seq_off: np.ndarray,
                          read_ids: np.ndarray, lx: int,
                          n_threads: int = 0):
    """Threaded native 2-BIT packed gather: ([n, lx//4] uint8, four
    A/C/G/T codes per byte low-bits-first, [n] int32 lengths) — or None
    when unavailable, lx % 4 != 0, or any pool byte is not A/C/G/T
    (caller falls back to the 4-bit protocol). Quarters the read
    transfer on the dominant pure-ACGT case."""
    lib = get_lib()
    if not hasattr(lib, "gio_gather_padded_packed2") or lx % 4:
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    read_ids = np.ascontiguousarray(read_ids, dtype=np.int64)
    out = np.empty((len(read_ids), lx // 4), dtype=np.uint8)
    lens = np.empty(len(read_ids), dtype=np.int32)
    if len(read_ids) == 0:
        return out, lens
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    pool = np.ascontiguousarray(seq_pool, dtype=np.uint8)
    off = np.ascontiguousarray(seq_off, dtype=np.int64)
    rc = lib.gio_gather_padded_packed2(
        pool.ctypes.data_as(u8p), off.ctypes.data_as(i64p),
        read_ids.ctypes.data_as(i64p), ctypes.c_int64(len(read_ids)),
        ctypes.c_int32(lx), out.ctypes.data_as(u8p),
        lens.ctypes.data_as(i32p), ctypes.c_int(n_threads))
    if rc != 0:
        return None
    return out, lens


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


_CRAM_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                              "libcramio.so")
_cram_lib: Optional[ctypes.CDLL] = None


def get_cram_lib() -> Optional[ctypes.CDLL]:
    """libcramio (native CRAM 3.0 container decoder), or None."""
    global _cram_lib
    if _cram_lib is None:
        if not os.path.exists(_CRAM_LIB_PATH):
            try:
                _build()
            except Exception:
                return None
        if not os.path.exists(_CRAM_LIB_PATH):
            return None
        lib = ctypes.CDLL(os.path.abspath(_CRAM_LIB_PATH))
        vp = ctypes.c_void_p
        lib.cram_decode.restype = vp
        lib.cram_decode.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64, ctypes.c_int]
        lib.cram_bam_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.cram_bam_data.argtypes = [vp]
        lib.cram_bam_len.restype = ctypes.c_int64
        lib.cram_bam_len.argtypes = [vp]
        lib.cram_bam_error.restype = ctypes.c_char_p
        lib.cram_bam_error.argtypes = [vp]
        lib.cram_bam_free.argtypes = [vp]
        _cram_lib = lib
    return _cram_lib


def cram_decode_native(path: str, fasta_path: Optional[str],
                       offsets=None, n_threads: int = 0) -> bytes:
    """Decode a CRAM into a raw BAM byte stream (uint8 ndarray) with
    libcramio. `offsets`: optional container byte offsets (the .crai
    region plan). Raises RuntimeError when the library is unavailable or
    the file uses a feature it does not support (caller falls back to
    the Python oracle, io/cram.py)."""
    lib = get_cram_lib()
    if lib is None:
        raise RuntimeError("libcramio unavailable")
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    offp, noff = None, 0
    if offsets is not None:
        o = np.ascontiguousarray(offsets, dtype=np.int64)
        noff = len(o)
        if noff == 0:
            # an EMPTY plan decodes nothing (vs None = whole file); keep
            # the pointer non-null so the C side can tell them apart
            o = np.zeros(1, dtype=np.int64)
        offp = o.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    h = lib.cram_decode(path.encode(), (fasta_path or "").encode(),
                        offp, ctypes.c_int64(noff), ctypes.c_int(n_threads))
    try:
        err = lib.cram_bam_error(h)
        if err:
            raise RuntimeError(f"native CRAM decode: {err.decode()}")
        n = int(lib.cram_bam_len(h))
        # NOT ctypes.string_at: its size parameter is a C int, silently
        # truncating streams > 2 GB (large-CRAM corruption)
        view = np.ctypeslib.as_array(lib.cram_bam_data(h), shape=(n,))
        return view.copy()
    finally:
        lib.cram_bam_free(h)


class ColumnarBam:
    """Columnar view of a decoded BAM — the whole file, or (with `chunks`,
    an [n, 2] array of BAI/CSI virtual-offset ranges) only the records the
    indexed region plan touches, with memory bounded by the plan instead
    of the file size. `bam_bytes` decodes a raw in-memory BAM stream
    instead of a file (the native CRAM path)."""

    def __init__(self, path: str, cb_tag: bytes = b"CB", n_threads: int = 0,
                 chunks=None, bam_bytes: Optional[bytes] = None):
        lib = get_lib()
        if n_threads <= 0:
            n_threads = os.cpu_count() or 1
        self._lib = lib
        if bam_bytes is not None:
            if not hasattr(lib, "gio_bam_load_bytes"):
                raise RuntimeError("libgenomio predates gio_bam_load_bytes; "
                                   "rebuild with native/build.sh")
            # accepts bytes or a uint8 ndarray (the native CRAM decoder
            # returns the latter — no 2 GB ctypes copy limits)
            arr = np.frombuffer(bam_bytes, dtype=np.uint8) \
                if isinstance(bam_bytes, (bytes, bytearray)) \
                else np.ascontiguousarray(bam_bytes, dtype=np.uint8)
            self._h = lib.gio_bam_load_bytes(
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int64(len(arr)), cb_tag, n_threads)
        elif chunks is not None:
            if not hasattr(lib, "gio_bam_load_regions"):
                raise RuntimeError("libgenomio predates gio_bam_load_regions; "
                                   "rebuild with native/build.sh")
            c = np.ascontiguousarray(chunks, dtype=np.int64).reshape(-1, 2)
            self._h = lib.gio_bam_load_regions(
                path.encode(), cb_tag, n_threads,
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(len(c)))
        elif (hasattr(lib, "gio_bam_load_stream")
              and os.environ.get("VARTRIX_STREAM_DECODE", "1") != "0"
              and os.path.getsize(path) >= 256 * 1024 * 1024):
            # bounded-memory whole-file decode: peak = columns + one
            # segment, instead of raw + fully-inflated + columns. Only
            # worth it when the raw file is big enough for peak memory
            # to matter: segment overhead measured 5x slower than the
            # monolithic loader on a 25MB sparse-coverage cohort BAM
            # (2.7s vs 0.5s at 600k reads), while at >=1GB streaming is
            # both necessary (RSS) and equal-speed (sequential IO bound).
            self._h = lib.gio_bam_load_stream(path.encode(), cb_tag,
                                              n_threads, ctypes.c_int64(0))
        else:
            self._h = lib.gio_bam_load(path.encode(), cb_tag, n_threads)
        err = lib.gio_bam_error(self._h)
        if err:
            raise IOError(f"{path}: {err.decode()}")
        n = lib.gio_bam_n_records(self._h)
        self.n = int(n)
        self.ref_names = [lib.gio_bam_ref_name(self._h, i).decode()
                          for i in range(lib.gio_bam_n_refs(self._h))]
        self.ref_lens = [int(lib.gio_bam_ref_len(self._h, i))
                         for i in range(lib.gio_bam_n_refs(self._h))]
        self.tid_by_name = {nm: i for i, nm in enumerate(self.ref_names)}

        def arr(name, count):
            if count == 0:
                # never dereference (possibly-NULL) empty buffers
                ct = getattr(lib, name).restype._type_
                return np.zeros(0, dtype=np.dtype(ct))
            return np.ctypeslib.as_array(getattr(lib, name)(self._h), (count,))

        self.tid = arr("gio_bam_tid", n)
        self.pos = arr("gio_bam_pos", n)
        self.ref_end = arr("gio_bam_ref_end", n)
        self.mapq = arr("gio_bam_mapq", n)
        self.flag = arr("gio_bam_flag", n)
        self.seq_off = arr("gio_bam_seq_off", n + 1)
        self.seq_pool = arr("gio_bam_seq_pool", int(self.seq_off[-1]) if n else 0)
        self.itv_off = arr("gio_bam_itv_off", n + 1)
        self.itv_pool = arr("gio_bam_itv_pool", int(self.itv_off[-1]) * 2 if n else 0)
        self.cb_off = arr("gio_bam_cb_off", n + 1)
        self.cb_pool = arr("gio_bam_cb_pool", int(self.cb_off[-1]) if n else 0)
        self.ub_off = arr("gio_bam_ub_off", n + 1)
        self.ub_pool = arr("gio_bam_ub_pool", int(self.ub_off[-1]) if n else 0)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.gio_bam_free(self._h)
                self._h = None
        except Exception:
            pass

    @staticmethod
    def _unique_map(off: np.ndarray, pool: np.ndarray, map_unique):
        """Vectorized variable-length-string mapping: group records by tag
        length, gather fixed-width byte matrices, dedupe by a vectorized
        64-bit FNV-style hash (1-D uint64 unique is ~10x cheaper than
        numpy's row-lexicographic unique), verify representatives
        byte-exactly (hash collisions fall back per-row, so the mapping is
        exact regardless), and only touch Python for the unique values.
        map_unique(bytes) -> int; absent tags map to -1."""
        n = len(off) - 1
        out = np.full(n, -1, dtype=np.int64)
        lens = np.diff(off)
        for L in np.unique(lens):
            if L == 0:
                continue
            idx = np.nonzero(lens == L)[0]
            gather = pool[off[idx][:, None] + np.arange(L, dtype=off.dtype)]
            h = np.zeros(len(idx), dtype=np.uint64)
            mul = np.uint64(1099511628211)
            for j in range(L):
                h = h * mul + gather[:, j]
            _, first, inv = np.unique(h, return_index=True,
                                      return_inverse=True)
            reps = gather[first]
            collided = np.nonzero((reps[inv] != gather).any(axis=1))[0]
            # memoized by bytes so map_unique (which may be a stateful
            # id-assigner, e.g. ub_ids' counter) is called at most once
            # per distinct value even across collision fallbacks
            memo: dict = {}

            def mapped(b: bytes) -> int:
                v = memo.get(b)
                if v is None:
                    v = memo[b] = map_unique(b)
                return v

            vals = np.fromiter(
                (mapped(r.tobytes()) for r in reps), dtype=np.int64,
                count=len(reps))
            out[idx] = vals[inv]
            for k in collided:  # exactness: never trust the hash alone
                out[idx[k]] = mapped(gather[k].tobytes())
        return out

    def cb_indices(self, barcodes: dict) -> np.ndarray:
        """Map each record's CB tag to a dense barcode index (-1 when the
        tag is absent, -2 when the barcode is not in the list)."""
        lib = self._lib
        if hasattr(lib, "gio_tag_lookup"):
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            items = list(barcodes.items())
            keys = np.frombuffer(b"".join(k for k, _ in items), np.uint8)
            koff = np.zeros(len(items) + 1, np.int64)
            np.cumsum([len(k) for k, _ in items], out=koff[1:])
            kvals = np.fromiter((v for _, v in items), np.int32,
                                count=len(items))
            out = np.empty(self.n, np.int32)
            lib.gio_tag_lookup(
                self.cb_pool.ctypes.data_as(u8p),
                self.cb_off.ctypes.data_as(i64p),
                ctypes.c_int64(self.n),
                keys.ctypes.data_as(u8p), koff.ctypes.data_as(i64p),
                ctypes.c_int64(len(items)),
                kvals.ctypes.data_as(i32p), ctypes.c_int32(-2),
                out.ctypes.data_as(i32p),
                ctypes.c_int(os.cpu_count() or 1))
            return out
        return self._unique_map(
            self.cb_off, self.cb_pool, lambda s: barcodes.get(s, -2)
        ).astype(np.int32)

    def cb_present(self) -> np.ndarray:
        return (self.cb_off[1:] - self.cb_off[:-1]) > 0

    def ub_ids(self) -> np.ndarray:
        """Map each record's UB tag to a per-file unique id (-1 = absent).
        Ids preserve equality, which is all the UMI grouping needs — so no
        Python-level per-value mapping is required: ids come straight from
        vectorized hash-unique per length group (with byte-exact collision
        repair), unlike cb_indices which must consult the barcode dict."""
        lib = self._lib
        if hasattr(lib, "gio_tag_ids"):
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            out = np.empty(self.n, np.int64)
            lib.gio_tag_ids(
                self.ub_pool.ctypes.data_as(u8p),
                self.ub_off.ctypes.data_as(i64p),
                ctypes.c_int64(self.n), out.ctypes.data_as(i64p),
                ctypes.c_int(os.cpu_count() or 1))
            return out
        off, pool = self.ub_off, self.ub_pool
        n = len(off) - 1
        out = np.full(n, -1, dtype=np.int64)
        lens = np.diff(off)
        base = 0
        for L in np.unique(lens):
            if L == 0:
                continue
            idx = np.nonzero(lens == L)[0]
            gather = pool[off[idx][:, None] + np.arange(L, dtype=off.dtype)]
            h = np.zeros(len(idx), dtype=np.uint64)
            mul = np.uint64(1099511628211)
            for j in range(L):
                h = h * mul + gather[:, j]
            uniq_h, first, inv = np.unique(h, return_index=True,
                                           return_inverse=True)
            ids = base + inv.astype(np.int64)
            reps = gather[first]
            collided = np.nonzero((reps[inv] != gather).any(axis=1))[0]
            next_id = base + len(uniq_h)
            if len(collided):
                # exactness: distinct byte values that share a hash get
                # fresh distinct ids (identical bytes share one)
                memo: dict = {}
                for k in collided.tolist():
                    b = gather[k].tobytes()
                    v = memo.get(b)
                    if v is None:
                        v = memo[b] = next_id
                        next_id += 1
                    ids[k] = v
            out[idx] = ids
            base = next_id
        return out
