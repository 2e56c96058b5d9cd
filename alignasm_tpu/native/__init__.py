"""Native host plane: builds and binds the C++ pipeline via ctypes.

The shared library compiles on first use (g++ -O2, ~seconds) and is
cached next to the sources; rebuilds when any source is newer.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "src"
_LIB = _DIR / "libalignasm.so"
_SOURCES = ["cs.cc", "io.cc", "solver.cc", "api.cc"]
_lock = threading.Lock()
_lib = None


class NativeError(RuntimeError):
    pass


def _needs_build() -> bool:
    if not _LIB.exists():
        return True
    lib_m = _LIB.stat().st_mtime
    return any((_SRC / s).stat().st_mtime > lib_m for s in _SOURCES) or any(
        p.stat().st_mtime > lib_m for p in _SRC.glob("*.h")
    )


def build(force: bool = False) -> pathlib.Path:
    with _lock:
        if force or _needs_build():
            cmd = [
                "g++", "-std=c++20", "-O3", "-march=native", "-fPIC", "-shared",
                "-o", str(_LIB),
            ] + [str(_SRC / s) for s in _SOURCES] + ["-pthread"]
            proc = subprocess.run(cmd, capture_output=True, text=True)
            if proc.returncode != 0:
                raise NativeError(f"native build failed:\n{proc.stderr[-4000:]}")
    return _LIB


class Stats(ctypes.Structure):
    _fields_ = [
        ("read_s", ctypes.c_double),
        ("solve_s", ctypes.c_double),
        ("write_s", ctypes.c_double),
        ("contigs", ctypes.c_longlong),
        ("records", ctypes.c_longlong),
    ]


def get_lib():
    global _lib
    if _lib is None:
        build()
        lib = ctypes.CDLL(str(_LIB))
        lib.aln_run_stats.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(Stats),
        ]
        lib.aln_run_stats.restype = ctypes.c_int
        _lib = lib
    return _lib


def run(
    paf_path: str,
    alt_path: str | None = None,
    alt_baseline: float = 0.5,
    non_skip_linkable: bool = False,
    threads: int = 0,
    lazy_walks: bool = True,
    out_prefix: str | None = None,
) -> dict:
    """Run the full native pipeline; writes <stem>.aln[.alt|.all].paf.
    Returns phase timings and counters."""
    lib = get_lib()
    err = ctypes.create_string_buffer(4096)
    stats = Stats()
    rc = lib.aln_run_stats(
        os.fsencode(paf_path),
        os.fsencode(alt_path) if alt_path else b"",
        alt_baseline,
        1 if non_skip_linkable else 0,
        threads,
        1 if lazy_walks else 0,
        os.fsencode(out_prefix) if out_prefix else b"",
        err,
        len(err),
        ctypes.byref(stats),
    )
    if rc != 0:
        raise NativeError(err.value.decode(errors="replace"))
    return {
        "read_s": stats.read_s,
        "solve_s": stats.solve_s,
        "write_s": stats.write_s,
        "contigs": stats.contigs,
        "records": stats.records,
    }
