"""Native (C++) fast ingest, loaded via ctypes.

The shared library is built on demand with g++ and cached next to the
source.  All entry points release the GIL, so a Python thread pool of
parser workers scales across host cores.  Falls back cleanly (returns
None from load_library) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastparse.cpp")
_LIB = os.path.join(_DIR, "libfastparse.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


class _FPResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("coords", ctypes.POINTER(ctypes.c_float)),
        ("serial", ctypes.POINTER(ctypes.c_int64)),
        ("res_serial", ctypes.POINTER(ctypes.c_int64)),
        ("occupancy", ctypes.POINTER(ctypes.c_float)),
        ("bfactor", ctypes.POINTER(ctypes.c_float)),
        ("hetero", ctypes.POINTER(ctypes.c_uint8)),
        ("chain_code", ctypes.POINTER(ctypes.c_int32)),
        ("resname_code", ctypes.POINTER(ctypes.c_int32)),
        ("name_code", ctypes.POINTER(ctypes.c_int32)),
        ("alt_code", ctypes.POINTER(ctypes.c_int32)),
        ("icode_code", ctypes.POINTER(ctypes.c_int32)),
        ("element_code", ctypes.POINTER(ctypes.c_int32)),
        ("chain_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_chain", ctypes.c_int32),
        ("resname_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_resname", ctypes.c_int32),
        ("name_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_name", ctypes.c_int32),
        ("alt_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_alt", ctypes.c_int32),
        ("icode_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_icode", ctypes.c_int32),
        ("element_tab", ctypes.POINTER(ctypes.c_char)),
        ("n_element", ctypes.c_int32),
        ("is_cif", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
        ("owner", ctypes.c_void_p),
    ]


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB, "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library():
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        lib.fastparse_file.argtypes = [ctypes.c_char_p]
        lib.fastparse_file.restype = ctypes.POINTER(_FPResult)
        lib.fastparse_free.argtypes = [ctypes.POINTER(_FPResult)]
        lib.fastparse_free.restype = None
        _lib = lib
        return _lib


def _codes_to_str(codes_ptr, n, tab_ptr, n_tab, width=8):
    codes = np.ctypeslib.as_array(codes_ptr, shape=(n,))
    raw = ctypes.string_at(tab_ptr, n_tab * width) if n_tab else b""
    table = np.frombuffer(raw, dtype=f"S{width}").astype(f"U{width}")
    if n_tab == 0:
        return np.full(n, "", dtype=f"U{width}"), codes.copy()
    return table[codes], codes.copy()


def parse_file_native(path: str):
    """Parse a structure file natively -> (AtomTable, format) or None.

    Returns None when the native library is unavailable; raises
    StructureReadError-compatible ValueError on parse failure.
    """
    lib = load_library()
    if lib is None:
        return None
    from ..io.structure import AtomTable

    res = lib.fastparse_file(path.encode())
    try:
        r = res.contents
        if r.error and r.error != b"":
            raise ValueError(r.error.decode(errors="replace"))
        n = int(r.n)
        if n == 0:
            return AtomTable.empty(), ("cif" if r.is_cif else "pdb")
        coords = np.ctypeslib.as_array(r.coords, shape=(n, 3)).copy()
        name, name_c = _codes_to_str(r.name_code, n, r.name_tab, r.n_name)
        alt, alt_c = _codes_to_str(r.alt_code, n, r.alt_tab, r.n_alt)
        resname, resname_c = _codes_to_str(r.resname_code, n, r.resname_tab, r.n_resname)
        chain, chain_c = _codes_to_str(r.chain_code, n, r.chain_tab, r.n_chain)
        icode, icode_c = _codes_to_str(r.icode_code, n, r.icode_tab, r.n_icode)
        element, _ = _codes_to_str(r.element_code, n, r.element_tab, r.n_element)
        table = AtomTable(
            coords=coords,
            serial=np.ctypeslib.as_array(r.serial, shape=(n,)).copy(),
            name=name,
            alt_loc=alt,
            resname=resname,
            chain_id=chain,
            res_serial=np.ctypeslib.as_array(r.res_serial, shape=(n,)).copy(),
            icode=icode,
            occupancy=np.ctypeslib.as_array(r.occupancy, shape=(n,)).copy(),
            bfactor=np.ctypeslib.as_array(r.bfactor, shape=(n,)).copy(),
            element=element,
            hetero=np.ctypeslib.as_array(r.hetero, shape=(n,)).copy().astype(bool),
            chain_code=chain_c,
            resname_code=resname_c,
            name_code=name_c,
            alt_code=alt_c,
            icode_code=icode_c,
        )
        return table, ("cif" if r.is_cif else "pdb")
    finally:
        lib.fastparse_free(res)
