"""Flat C-style API surface.

The reference exposes C (tfhe/src/c_api/) and WASM (js_on_wasm_api/)
bindings around the HLAPI.  The TPU framework's host language *is* Python,
so the binding layer inverts: this module provides the same flat
opaque-handle surface shape (create/destroy/op functions returning status
codes) that a cffi/ctypes consumer — or a non-Python host embedding
CPython — would bind against.  Handles are integers; every function returns
(status, result) with status 0 on success, mirroring the reference's
`c_api` conventions (opaque pointer + destroy_* pattern).
"""
from __future__ import annotations

import itertools
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from . import hlapi, integer, shortint
from .core.params import shortint_params

_HANDLES: Dict[int, Any] = {}
_NEXT = itertools.count(1)

OK = 0
ERR = 1


def _new(obj) -> int:
    h = next(_NEXT)
    _HANDLES[h] = obj
    return h


def _get(h):
    return _HANDLES[h]


def destroy(handle: int) -> int:
    """reference destroy_* functions."""
    return OK if _HANDLES.pop(handle, None) is not None else ERR


# -- config / keygen --------------------------------------------------------


def config_builder_default() -> tuple[int, int]:
    return OK, _new(hlapi.ConfigBuilder.default())


def config_builder_custom(name: str) -> tuple[int, int]:
    """reference ConfigBuilder::use_custom_parameters; also accepts
    TEST_PARAMS_SHORTINT (tiny insecure set) for FFI smoke tests.
    Validates the parameter-set name eagerly so an unknown name returns ERR
    here rather than surfacing later at tfhe_generate_keys."""
    try:
        if name != "TEST_PARAMS_SHORTINT":
            from .core.params import shortint_params
            shortint_params(name)  # raises on unknown name
        cfg = hlapi.ConfigBuilder().use_custom_parameters(name).build()
        return OK, _new(cfg)
    except Exception:
        return ERR, 0


def generate_keys(config_handle: int, seed: int = 0) -> tuple[int, int, int]:
    try:
        ck, sk = hlapi.generate_keys(_get(config_handle), seed=seed)
        return OK, _new(ck), _new(sk)
    except Exception:
        return ERR, 0, 0


def set_server_key(sk_handle: int) -> int:
    hlapi.set_server_key(_get(sk_handle))
    return OK


# -- FheUint8 (other widths follow the same pattern) -------------------------


def fheuint8_try_encrypt_with_client_key(value: int, ck_handle: int,
                                         seed: int = 0) -> tuple[int, int]:
    try:
        ct = hlapi.FheUint8.encrypt(jnp.asarray(value), _get(ck_handle), seed=seed)
        return OK, _new(ct)
    except Exception:
        return ERR, 0


def fheuint8_decrypt(ct_handle: int, ck_handle: int) -> tuple[int, int]:
    try:
        return OK, int(np.asarray(_get(ct_handle).decrypt(_get(ck_handle))))
    except Exception:
        return ERR, 0


def _binop(name):
    def op(lhs: int, rhs: int) -> tuple[int, int]:
        try:
            a, b = _get(lhs), _get(rhs)
            return OK, _new(getattr(a, name)(b))
        except Exception:
            return ERR, 0
    return op


fheuint8_add = _binop("__add__")
fheuint8_sub = _binop("__sub__")
fheuint8_mul = _binop("__mul__")
fheuint8_bitand = _binop("__and__")
fheuint8_bitor = _binop("__or__")
fheuint8_bitxor = _binop("__xor__")
fheuint8_eq = _binop("eq")
fheuint8_le = _binop("le")


def fheuint8_scalar_add(lhs: int, scalar: int) -> tuple[int, int]:
    try:
        return OK, _new(_get(lhs) + int(scalar))
    except Exception:
        return ERR, 0


# -- serialization -----------------------------------------------------------


def serialize(handle: int) -> tuple[int, bytes]:
    import io
    from .utils import save
    try:
        buf = io.BytesIO()
        obj = _get(handle)
        save(obj.ct if hasattr(obj, "ct") else obj, buf)
        return OK, buf.getvalue()
    except Exception:
        return ERR, b""


def deserialize_fheuint8(data: bytes) -> tuple[int, int]:
    import io
    from .utils import load
    try:
        return OK, _new(hlapi.FheUint8(load(io.BytesIO(data))))
    except Exception:
        return ERR, 0
