"""Versioned, validated serialization for keys and ciphertexts.

Re-design of the reference's `safe_serialization.rs` (version string + type
name + size limit on top of bincode, reference tfhe/src/safe_deserialization.rs:16-60)
and `conformance.rs` parameter validation.

Format: a .npz archive — arrays as entries, structure/static metadata as a
JSON entry.  No pickle anywhere (untrusted-input safe, like the reference's
format choice).  Pytrees are encoded by a registry of known entity types.
"""
from __future__ import annotations

import dataclasses
import io
import json
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

SERIALIZATION_VERSION = "tfhe_tpu-v1"

# registry: class name -> (module path, class); populated lazily
_REGISTRY: Dict[str, Any] = {}


class DeserializationError(ValueError):
    pass


def _register_known_types():
    if _REGISTRY:
        return
    from ..core import entities as E
    from ..core.algorithms import seeded as S
    from ..core.algorithms.multi_bit import NttMultiBitBootstrapKey
    from ..core.algorithms.public_key import (LweCompactPublicKey,
                                              LwePublicKey)
    from ..core.params import (BooleanParameters, ClassicPBSParameters,
                               DecompParams, GadgetParameters,
                               MultiBitPBSParameters, WopbsParameters)
    from ..boolean import (BoolCiphertext, ClientKey as BooleanClientKey,
                           CompressedPublicKey as BooleanCompressedPublicKey,
                           CompressedServerKey as BooleanCompressedServerKey,
                           PublicKey as BooleanPublicKey,
                           ServerKey as BooleanServerKey)
    from ..shortint.ciphertext import (Ciphertext as ShortintCiphertext,
                                       CompressedCiphertext
                                       as ShortintCompressedCiphertext)
    from ..shortint.client_key import ClientKey as ShortintClientKey
    from ..shortint.server_key import (CompressedServerKey
                                       as ShortintCompressedServerKey,
                                       LookupTable,
                                       ServerKey as ShortintServerKey)
    from ..integer.ciphertext import (CrtCiphertext, RadixCiphertext,
                                      SignedRadixCiphertext)
    from ..gadget.engine import (Ciphertext as GadgetCiphertext,
                                 ClientKey as GadgetClientKey,
                                 ServerKey as GadgetServerKey)
    from ..core.algorithms.wopbs import CbsPfpkskList
    from ..shortint.wopbs import CombinedWopbsKey, WopbsKey
    from ..integer.shift_key import ShiftKey
    from ..integer.server_key import ServerKey as IntegerServerKey
    for cls in [E.LweCiphertext, E.LweSecretKey, E.GlweCiphertext,
                E.GlweSecretKey, E.GgswCiphertext, E.LweBootstrapKey,
                E.NttLweBootstrapKey, E.LweKeyswitchKey,
                E.LwePackingKeyswitchKey, E.GlweRelinearizationKey,
                S.SeededLweCiphertext, S.SeededGlweCiphertext,
                S.SeededLweBootstrapKey, S.SeededLweKeyswitchKey,
                S.SeededGgswCiphertextList, S.SeededLweMultiBitBootstrapKey,
                S.SeededLwePackingKeyswitchKey, S.SeededLwePublicKey,
                LwePublicKey, LweCompactPublicKey, NttMultiBitBootstrapKey,
                S.SeededLweCompactPublicKey,
                DecompParams, ClassicPBSParameters, MultiBitPBSParameters,
                WopbsParameters, BooleanParameters, GadgetParameters,
                BoolCiphertext, BooleanClientKey, BooleanServerKey,
                BooleanCompressedServerKey, BooleanCompressedPublicKey,
                BooleanPublicKey,
                ShortintCiphertext, ShortintCompressedCiphertext,
                ShortintClientKey, ShortintServerKey,
                ShortintCompressedServerKey,
                LookupTable, RadixCiphertext, SignedRadixCiphertext,
                CrtCiphertext, GadgetCiphertext, GadgetClientKey,
                GadgetServerKey,
                CbsPfpkskList, WopbsKey, CombinedWopbsKey, ShiftKey,
                IntegerServerKey]:
        _REGISTRY[f"{cls.__module__}.{cls.__name__}"] = cls


def _encode(obj, arrays: Dict[str, np.ndarray], prefix: str, seen=None):
    """→ JSON-able structure; arrays stored by path key.

    `seen` dedups arrays by object identity: composite keys share big
    components (the shift key holds three references to the same compute
    BSK), so each shared array is stored ONCE."""
    import numpy
    from ..gadget.encoding import Encoding
    if seen is None:
        seen = {}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "lit", "v": obj}
    if isinstance(obj, (np.integer,)):
        return {"t": "lit", "v": int(obj)}
    if isinstance(obj, (np.floating,)):
        return {"t": "lit", "v": float(obj)}
    if isinstance(obj, (jnp.ndarray, np.ndarray)):
        key = seen.get(id(obj))
        if key is None:
            key = f"a{len(arrays)}"
            arrays[key] = np.asarray(obj)
            seen[id(obj)] = key
        return {"t": "arr", "k": key}
    if isinstance(obj, Encoding):
        return {"t": "encoding", "o": obj.origin_modulus, "p": obj.modulus_p,
                "wopbs": obj.wopbs,
                "parts": [sorted(part) for part in obj.parts]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "v": [_encode(x, arrays, prefix, seen) for x in obj]}
    if dataclasses.is_dataclass(obj):
        _register_known_types()
        name = f"{type(obj).__module__}.{type(obj).__name__}"
        if name not in _REGISTRY:
            raise DeserializationError(f"unregistered type {name}")
        # phase tables on NTT bootstrap keys are pure functions of (N, P):
        # store a marker instead of ~256 MB of regenerable data
        derived = (_DERIVED_FIELDS.get(type(obj).__name__, ())
                   if name.startswith("tfhe_tpu.") else ())
        fields = {f.name: ({"t": "derived"} if f.name in derived
                           and getattr(obj, f.name) is not None else
                           _encode(getattr(obj, f.name), arrays, prefix,
                                   seen))
                  for f in dataclasses.fields(obj)}
        return {"t": "obj", "cls": name, "fields": fields}
    raise DeserializationError(f"cannot serialize {type(obj)}")


# per-class fields regenerated at decode time (see _regen_derived)
_DERIVED_FIELDS = {"NttLweBootstrapKey": ("mono", "mono_shoup"),
                   "NttMultiBitBootstrapKey": ("mono", "mono_shoup")}


def _regen_derived(obj):
    """Recompute the monomial phase tables dropped by _encode (full
    [2n, ...] below the split threshold, the factored stack above it —
    fourstep.monomial_tables_for is the single source of the rule)."""
    from ..core.poly.fourstep import monomial_tables_for
    cls = type(obj).__name__
    if cls == "NttLweBootstrapKey":
        n, npr, minus_one = obj.data.shape[-1], obj.data.shape[1], True
        order = obj.paired_order
    else:
        n, npr, minus_one = obj.data.shape[-1], obj.data.shape[2], False
        order = obj.u32_order
    tab, sh = monomial_tables_for(int(n), int(npr), minus_one,
                                  lanes=(order == "fourstep-lanes"))
    return obj.replace(mono=jnp.asarray(tab), mono_shoup=jnp.asarray(sh))


def _decode(node, arrays, shared=None):
    from ..gadget.encoding import Encoding
    if shared is None:
        shared = {}
    t = node["t"]
    if t == "lit":
        return node["v"]
    if t == "arr":
        k = node["k"]
        if k not in shared:          # share repeated references on load too
            shared[k] = jnp.asarray(arrays[k])
        return shared[k]
    if t == "encoding":
        return Encoding(node["o"], node["parts"], node["p"],
                        wopbs=node["wopbs"], _validate=False)
    if t in ("list", "tuple"):
        vals = [_decode(x, arrays, shared) for x in node["v"]]
        return vals if t == "list" else tuple(vals)
    if t == "derived":
        return None
    if t == "obj":
        _register_known_types()
        cls = _REGISTRY.get(node["cls"])
        if cls is None:
            raise DeserializationError(f"unknown type {node['cls']}")
        fields = {k: _decode(v, arrays, shared)
                  for k, v in node["fields"].items()}
        obj = cls(**fields)
        if any(v.get("t") == "derived" for v in node["fields"].values()):
            obj = _regen_derived(obj)
        return obj
    raise DeserializationError(f"bad node {t}")


def save(obj, path_or_buf, compress: bool = True):
    """Plain serialization (reference: raw serde/bincode tier).
    compress=False skips zlib — key material is incompressible and large;
    the key cache uses the raw format to keep save/load well under keygen
    cost."""
    arrays: Dict[str, np.ndarray] = {}
    tree = _encode(obj, arrays, "")
    meta = json.dumps({"version": SERIALIZATION_VERSION,
                       "type": _type_name(obj), "tree": tree})
    writer = np.savez_compressed if compress else np.savez
    writer(path_or_buf, __meta__=np.frombuffer(
        meta.encode(), dtype=np.uint8), **arrays)


def _type_name(obj) -> str:
    return f"{type(obj).__module__}.{type(obj).__name__}"


def load(path_or_buf):
    with np.load(path_or_buf) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return _decode(meta["tree"], arrays)


def safe_save(obj, path_or_buf):
    save(obj, path_or_buf)


def safe_load(path_or_buf, expected_type: str = None,
              size_limit: int = None, conformance=None):
    """Versioned + type-named + size-limited load
    (reference safe_deserialize, safe_deserialization.rs:16-60)."""
    if size_limit is not None and hasattr(path_or_buf, "__fspath__"):
        import os
        actual = os.path.getsize(path_or_buf)
        if actual > size_limit:
            raise DeserializationError(
                f"serialized size {actual} exceeds limit {size_limit}")
    with np.load(path_or_buf) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    if meta["version"] != SERIALIZATION_VERSION:
        raise DeserializationError(
            f"version mismatch: {meta['version']} != {SERIALIZATION_VERSION}")
    if expected_type is not None and not (
            meta["type"] == expected_type
            or meta["type"].endswith("." + expected_type)):
        raise DeserializationError(
            f"type mismatch: expected {expected_type}, got {meta['type']}")
    obj = _decode(meta["tree"], arrays)
    if conformance is not None and not conformance(obj):
        raise DeserializationError("parameter conformance check failed")
    return obj
