"""Native (C++) components, exposed through ctypes.

Currently: the AES-128-CTR tree-forkable CSPRNG (reference: concrete-csprng
crate, SURVEY.md §2.1 [NATIVE]).  The shared library builds lazily with g++
on first use; everything degrades gracefully (ImportError) when no compiler
is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libtfhe_csprng.so"
_LIB = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_DIR / "csprng.cpp")],
        check=True, capture_output=True)


def _lib():
    global _LIB
    if _LIB is None:
        if not _SO.exists():
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.csprng_new.restype = ctypes.c_void_p
        lib.csprng_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.csprng_free.argtypes = [ctypes.c_void_p]
        lib.csprng_fill.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
        lib.csprng_fork.restype = ctypes.c_void_p
        lib.csprng_fork.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.csprng_aes_block.argtypes = [ctypes.c_char_p] * 3
        lib.csprng_aes_block_soft.argtypes = [ctypes.c_char_p] * 3
        lib.csprng_backend.restype = ctypes.c_int
        _LIB = lib
    return _LIB


class AesCtrGenerator:
    """Tree-forkable AES-CTR byte stream (reference `RandomGenerator`)."""

    def __init__(self, seed: bytes = None, _handle=None):
        lib = _lib()
        if _handle is not None:
            self._h = _handle
        else:
            if seed is None:
                seed = os.urandom(16)
            assert len(seed) == 16
            self._h = lib.csprng_new(seed, 0)
        self._lib = lib

    def generate(self, n: int) -> bytes:
        buf = ctypes.create_string_buffer(n)
        self._lib.csprng_fill(self._h, buf, n)
        return buf.raw

    def fork(self, child_index: int = 0) -> "AesCtrGenerator":
        """Deterministic child stream (reference fork-tree contract)."""
        h = self._lib.csprng_fork(self._h, child_index)
        return AesCtrGenerator(_handle=h)

    def __del__(self):
        try:
            self._lib.csprng_free(self._h)
        except Exception:
            pass


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One AES-128 block (for FIPS-197 test vectors)."""
    out = ctypes.create_string_buffer(16)
    _lib().csprng_aes_block(key, block, out)
    return out.raw


def aes128_encrypt_block_soft(key: bytes, block: bytes) -> bytes:
    """Portable-software twin of aes128_encrypt_block (backend parity tests)."""
    out = ctypes.create_string_buffer(16)
    _lib().csprng_aes_block_soft(key, block, out)
    return out.raw


def backend() -> str:
    """Live AES backend: "aesni" (hardware, runtime-detected) or "soft"
    (reference analogue: concrete-csprng's aesni/soft implems, §2.1)."""
    return "aesni" if _lib().csprng_backend() == 1 else "soft"


# -- C API shared library (reference: tfhe/src/c_api + cbindgen tfhe.h) -----

_CAPI_SO = _DIR / "libtfhe_tpu_capi.so"


def build_capi() -> Path:
    """Build libtfhe_tpu_capi.so (C ABI over the HLAPI, embeds CPython).
    Header: native/include/tfhe_tpu.h; C client example/test:
    tests/c_api/test_high_level_integers.c."""
    import sysconfig
    if _CAPI_SO.exists() and _CAPI_SO.stat().st_mtime > (
            _DIR / "capi.cpp").stat().st_mtime:
        return _CAPI_SO
    inc = sysconfig.get_paths()["include"]
    ver = sysconfig.get_config_var("LDVERSION")
    libdir = sysconfig.get_config_var("LIBDIR")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", str(_DIR / "capi.cpp"),
         f"-I{inc}", f"-I{_DIR / 'include'}",
         f"-L{libdir}", f"-Wl,-rpath,{libdir}", f"-lpython{ver}",
         "-o", str(_CAPI_SO)],
        check=True, capture_output=True)
    return _CAPI_SO
