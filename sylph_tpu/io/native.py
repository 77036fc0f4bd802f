"""ctypes bridge to the native FASTX decoder (native/fastxio.c).

Compiled on first use with the system toolchain (cc -O3, linked against
zlib) and cached next to the source; falls back to the pure-numpy parser if
no compiler is available (callers: parse_fastx in .fastx). Set
SYLPH_TPU_NO_NATIVE=1 to force the Python path.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "fastxio.c")
_SO = os.path.join(os.path.dirname(_SRC), "libfastxio.so")


class _FxResult(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("n_codes", ctypes.c_int64),
        ("starts", ctypes.POINTER(ctypes.c_int64)),
        ("ends", ctypes.POINTER(ctypes.c_int64)),
        ("n_records", ctypes.c_int64),
        ("names", ctypes.c_char_p),
        ("names_len", ctypes.c_int64),
        ("error", ctypes.c_char_p),
    ]


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (not os.path.exists(_SRC) or
                                os.path.getmtime(_SO) >=
                                os.path.getmtime(_SRC)):
        return _SO
    if not os.path.exists(_SRC):
        return None
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"],
                check=True, capture_output=True, timeout=120)
            return _SO
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("SYLPH_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fx_parse.restype = ctypes.POINTER(_FxResult)
        lib.fx_parse_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_int]
        lib.fx_parse_buffer.restype = ctypes.POINTER(_FxResult)
        lib.fx_free.argtypes = [ctypes.POINTER(_FxResult)]
        lib.fx_free.restype = None
        _LIB = lib
        return _LIB


def parse_fastx_native(path: str, skip_names: bool = False):
    """Native parse -> ParsedFastx, or None if unavailable.

    Raises FastxParseError on malformed input (same contract as the
    numpy parser).
    """
    lib = get_lib()
    if lib is None:
        return None
    rp = lib.fx_parse(path.encode(), 1 if skip_names else 0)
    return _convert(lib, rp)


def parse_fastx_buffer_native(data, skip_names: bool = False):
    """Native parse of an in-memory decompressed block (bytes, bytearray,
    or memoryview — the BGZF framer hands over views of the inflate
    buffers without a bytes() copy), or None."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    if n == 0:
        ptr = None
    else:
        arr = np.frombuffer(data, np.uint8)   # zero-copy for all three
        ptr = arr.ctypes.data
    rp = lib.fx_parse_buffer(ptr, n, 1 if skip_names else 0)
    return _convert(lib, rp)


def _convert(lib, rp):
    from .fastx import FastxParseError, ParsedFastx
    if not rp:
        raise MemoryError("fx_parse allocation failure")
    try:
        r = rp.contents
        if r.error:
            raise FastxParseError(r.error.decode("utf-8", "replace"))
        n_codes = int(r.n_codes)
        n_rec = int(r.n_records)
        codes = np.ctypeslib.as_array(r.codes, shape=(n_codes,)).copy() \
            if n_codes else np.empty(0, np.uint8)
        starts = np.ctypeslib.as_array(r.starts, shape=(n_rec,)).copy() \
            if n_rec else np.empty(0, np.int64)
        ends = np.ctypeslib.as_array(r.ends, shape=(n_rec,)).copy() \
            if n_rec else np.empty(0, np.int64)
        names = []
        if r.names_len:
            blob = ctypes.string_at(r.names, int(r.names_len))
            names = blob.decode("utf-8", "replace").split("\n")[:n_rec]
        return ParsedFastx(codes, starts, ends, names)
    finally:
        lib.fx_free(rp)
