"""High-level API: FheUint/FheInt/FheBool with operator overloading.

Re-design of the reference HLAPI (tfhe/src/high_level_api/, design doc
high_level_api/design.md): `ConfigBuilder` → `generate_keys` → typed
encrypted integers whose Python operators dispatch to the radix server key.
Like the reference's thread-local `set_server_key` global
(high_level_api/global_state.rs:13-15,62), the server key is installed into
module state once and every overloaded operator uses it.

Batched: every Fhe type holds a batch of values ([...] leading axes).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import integer, shortint
from ..core.params import shortint_params

__all__ = ["ConfigBuilder", "Config", "ClientKey", "ServerKey", "PublicKey",
           "CompactPublicKey", "CompressedServerKey", "CompressedFheUint",
           "generate_keys", "set_server_key", "unset_server_key",
           "FheBool", "FheUint2", "FheUint4", "FheUint8", "FheUint16",
           "FheUint32", "FheUint64", "FheUint128", "FheUint256",
           "FheInt8", "FheInt16", "FheInt32", "FheInt64",
           "FheInt128", "FheInt256"]

_SERVER_KEY: Optional[integer.ServerKey] = None


def set_server_key(sk: "ServerKey"):
    global _SERVER_KEY
    _SERVER_KEY = sk.radix


def unset_server_key():
    global _SERVER_KEY
    _SERVER_KEY = None


def _sk() -> integer.ServerKey:
    if _SERVER_KEY is None:
        raise RuntimeError("no server key set — call set_server_key(server_key)")
    return _SERVER_KEY


@dataclass(frozen=True)
class Config:
    params_name: str = "PARAM_MESSAGE_2_CARRY_2_KS_PBS"


class ConfigBuilder:
    """reference high_level_api/config.rs."""

    def __init__(self):
        self._params = "PARAM_MESSAGE_2_CARRY_2_KS_PBS"

    def use_custom_parameters(self, name: str) -> "ConfigBuilder":
        self._params = name
        return self

    def build(self) -> Config:
        return Config(params_name=self._params)

    @staticmethod
    def default() -> Config:
        return ConfigBuilder().build()


class ClientKey:
    def __init__(self, shortint_ck: shortint.ClientKey):
        self.shortint_ck = shortint_ck

    def radix(self, num_blocks: int) -> integer.RadixClientKey:
        return integer.RadixClientKey(key=self.shortint_ck, num_blocks=num_blocks)


class ServerKey:
    def __init__(self, radix: integer.ServerKey):
        self.radix = radix


class PublicKey:
    """Encryption-only key: LWE zero-encryptions summed over a fresh random
    binary subset per ciphertext (reference `PublicKey`,
    high_level_api/keys/public.rs over core lwe_public_key.rs)."""

    def __init__(self, client_key: ClientKey, zero_count: int = None,
                 seed: int = 1):
        from ..core import rng
        from ..core.algorithms.public_key import generate_lwe_public_key
        ck = client_key.shortint_ck
        n = ck.encryption_key.lwe_dimension
        key = rng.fork(rng.key_from_seed(seed), 0xA11)
        self.pk = generate_lwe_public_key(key, ck.encryption_key,
                                          zero_count or 2 * n,
                                          ck.encryption_noise_std, 64)
        self.params = ck.params

    def encrypt_radix(self, values, num_blocks: int,
                      seed: int = 0) -> "integer.RadixCiphertext":
        from ..core import rng
        from ..core.algorithms.public_key import encrypt_lwe_with_public_key
        from ..integer.ciphertext import RadixCiphertext
        from ..shortint.ciphertext import Ciphertext as Block
        from ..shortint.ciphertext import NoiseLevel
        from ..shortint.client_key import delta_for
        p = self.params
        m = p.message_modulus
        vals = np.asarray(values, dtype=object).reshape(-1) % (m ** num_blocks)
        shape = np.shape(values)
        blocks = []
        for i in range(num_blocks):
            bv = jnp.asarray(((vals // m ** i) % m).astype(np.uint64)).reshape(shape)
            key = rng.fork(rng.key_from_seed(seed * 1013 + i), 0xA12)
            lwe = encrypt_lwe_with_public_key(key, self.pk,
                                              bv * delta_for(p))
            blocks.append(Block(lwe=lwe, degree=m - 1, message_modulus=m,
                                carry_modulus=p.carry_modulus,
                                noise_level=NoiseLevel.NOMINAL))
        return RadixCiphertext(blocks=blocks)


class CompactPublicKey:
    """Ring-LWE compact public key: one (a(X), b(X)) pair; a batch of
    ciphertexts shares one encryption polynomial (reference
    `CompactPublicKey`, core lwe_compact_public_key.rs).  Requires a
    power-of-two encryption-key dimension (the reference's constraint)."""

    def __init__(self, client_key: ClientKey, seed: int = 2):
        from ..core import rng
        from ..core.algorithms.public_key import generate_lwe_compact_public_key
        ck = client_key.shortint_ck
        key = rng.fork(rng.key_from_seed(seed), 0xA21)
        self.pk = generate_lwe_compact_public_key(
            key, ck.encryption_key, ck.encryption_noise_std, 64)
        self.params = ck.params

    def encrypt_radix(self, values, num_blocks: int, seed: int = 0):
        from ..core import rng
        from ..core.algorithms.public_key import encrypt_lwe_compact_batch
        from ..core.entities import LweCiphertext
        from ..integer.ciphertext import RadixCiphertext
        from ..shortint.ciphertext import Ciphertext as Block
        from ..shortint.ciphertext import NoiseLevel
        from ..shortint.client_key import delta_for
        p = self.params
        m = p.message_modulus
        vals = np.asarray(values, dtype=object).reshape(-1) % (m ** num_blocks)
        digits = np.stack([(vals // m ** i % m).astype(np.uint64)
                           for i in range(num_blocks)], axis=-1)
        key = rng.fork(rng.key_from_seed(seed), 0xA22)
        cts = encrypt_lwe_compact_batch(key, self.pk,
                                        jnp.asarray(digits) * delta_for(p),
                                        p.glwe_noise_std)
        shape = np.shape(values)
        blocks = []
        for i in range(num_blocks):
            data = cts.data[..., i, :].reshape(shape + cts.data.shape[-1:])
            blocks.append(Block(lwe=LweCiphertext(data=data), degree=m - 1,
                                message_modulus=m,
                                carry_modulus=p.carry_modulus,
                                noise_level=NoiseLevel.NOMINAL))
        return RadixCiphertext(blocks=blocks)


class CompressedServerKey:
    """Seed + bodies only on the wire (reference CompressedServerKey)."""

    def __init__(self, client_key: ClientKey, seed: int = 3):
        self.inner = shortint.gen_compressed_server_key(
            client_key.shortint_ck, seed=seed)

    def decompress(self) -> "ServerKey":
        return ServerKey(integer.ServerKey(key=self.inner.decompress()))


def generate_keys(config: Config = None, seed: int = 0, shift_key=None):
    """→ (ClientKey, ServerKey) — reference tfhe::generate_keys.

    shift_key: None (default), or a wopbs parameter set / named-set string /
    "auto" to also generate the GGSW-selector shift key, which accelerates
    encrypted-amount `<<`, `>>` and rotations ~3x (integer/shift_key.py)."""
    config = config or ConfigBuilder.default()
    ck, sk = shortint.gen_keys(shortint_params(config.params_name), seed=seed)
    shk = None
    if shift_key is not None:
        from ..integer.shift_key import new_shift_key
        shk = new_shift_key(ck, sk, shift_key, seed=seed)
    return ClientKey(ck), ServerKey(integer.ServerKey(key=sk, shift_key=shk))


class _FheUintBase:
    """GenericInteger<P> analogue (high_level_api/integers/types/base.rs)."""

    NUM_BITS: int = 8
    SIGNED: bool = False

    def __init__(self, ct: integer.RadixCiphertext):
        self.ct = ct

    # -- encryption ----------------------------------------------------

    @classmethod
    def num_blocks(cls, ck: ClientKey) -> int:
        bits = int(math.log2(ck.shortint_ck.params.message_modulus))
        return cls.NUM_BITS // bits

    @classmethod
    def encrypt(cls, values, ck: ClientKey, seed: int = 0):
        rck = ck.radix(cls.num_blocks(ck))
        if cls.SIGNED:
            return cls(rck.encrypt_signed(values, seed=seed))
        return cls(rck.encrypt(values, seed=seed))

    @classmethod
    def encrypt_trivial(cls, values, ck: ClientKey):
        rck = ck.radix(cls.num_blocks(ck))
        return cls(rck.trivial_encrypt(values))

    def decrypt(self, ck: ClientKey):
        rck = ck.radix(self.ct.num_blocks)
        if self.SIGNED:
            return rck.decrypt_signed(
                integer.SignedRadixCiphertext(blocks=self.ct.blocks))
        return rck.decrypt(self.ct)

    # -- operators -----------------------------------------------------

    def _wrap(self, ct):
        return type(self)(ct)

    def __add__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().add(self.ct, other.ct))
        return self._wrap(_sk().scalar_add(self.ct, int(other)))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().sub(self.ct, other.ct))
        return self._wrap(_sk().scalar_sub(self.ct, int(other)))

    def __rsub__(self, other):
        return self._wrap(_sk().scalar_add(_sk().neg(self.ct), int(other)))

    def __mul__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().mul(self.ct, other.ct))
        return self._wrap(_sk().scalar_mul(self.ct, int(other)))

    __rmul__ = __mul__

    def __neg__(self):
        return self._wrap(_sk().neg(self.ct))

    def __and__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().bitand(self.ct, other.ct))
        return self._wrap(_sk().scalar_bitand(self.ct, int(other)))

    __rand__ = __and__

    def __or__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().bitor(self.ct, other.ct))
        return self._wrap(_sk().scalar_bitor(self.ct, int(other)))

    __ror__ = __or__

    def __xor__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().bitxor(self.ct, other.ct))
        return self._wrap(_sk().scalar_bitxor(self.ct, int(other)))

    __rxor__ = __xor__

    def __invert__(self):
        return self._wrap(_sk().bitnot(self.ct))

    def __lshift__(self, shift):
        if isinstance(shift, _FheUintBase):
            return self._wrap(_sk().left_shift(self.ct, shift.ct))
        return self._wrap(_sk().scalar_left_shift(self.ct, int(shift)))

    def __rshift__(self, shift):
        """Logical for FheUint, arithmetic (sign-extending) for FheInt —
        the reference's Shr semantics per type."""
        if self.SIGNED:
            if isinstance(shift, _FheUintBase):
                return self._wrap(_sk().right_shift_arithmetic(self.ct, shift.ct))
            return self._wrap(_sk().scalar_right_shift_arithmetic(
                self.ct, int(shift)))
        if isinstance(shift, _FheUintBase):
            return self._wrap(_sk().right_shift(self.ct, shift.ct))
        return self._wrap(_sk().scalar_right_shift(self.ct, int(shift)))

    def rotate_left(self, amount):
        """Bit-rotation (reference FheUint::rotate_left)."""
        if isinstance(amount, _FheUintBase):
            return self._wrap(_sk().rotate_left(self.ct, amount.ct))
        return self._wrap(_sk().scalar_rotate_left(self.ct, int(amount)))

    def rotate_right(self, amount):
        if isinstance(amount, _FheUintBase):
            return self._wrap(_sk().rotate_right(self.ct, amount.ct))
        return self._wrap(_sk().scalar_rotate_right(self.ct, int(amount)))

    def __floordiv__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().div(self.ct, other.ct))
        if self.SIGNED:
            return self._wrap(_sk().signed_scalar_div(self.ct, int(other)))
        return self._wrap(_sk().scalar_div(self.ct, int(other)))

    def __truediv__(self, other):
        return self.__floordiv__(other)

    def __mod__(self, other):
        if isinstance(other, _FheUintBase):
            return self._wrap(_sk().rem(self.ct, other.ct))
        if self.SIGNED:
            return self._wrap(_sk().signed_scalar_rem(self.ct, int(other)))
        return self._wrap(_sk().scalar_rem(self.ct, int(other)))

    def abs(self):
        if not self.SIGNED:
            return self
        return self._wrap(_sk().abs_signed(self.ct))

    # comparisons return FheBool
    def eq(self, other):
        if isinstance(other, _FheUintBase):
            return FheBool(_sk().eq(self.ct, other.ct))
        return FheBool(_sk().scalar_eq(self.ct, int(other)))

    def ne(self, other):
        if isinstance(other, _FheUintBase):
            return FheBool(_sk().ne(self.ct, other.ct))
        return FheBool(_sk().scalar_ne(self.ct, int(other)))

    def lt(self, other):
        if isinstance(other, _FheUintBase):
            fn = _sk().lt_signed if self.SIGNED else _sk().lt
            return FheBool(fn(self.ct, other.ct))
        fn = _sk().scalar_lt_signed if self.SIGNED else _sk().scalar_lt
        return FheBool(fn(self.ct, int(other)))

    def le(self, other):
        if isinstance(other, _FheUintBase):
            fn = _sk().le_signed if self.SIGNED else _sk().le
            return FheBool(fn(self.ct, other.ct))
        fn = _sk().scalar_le_signed if self.SIGNED else _sk().scalar_le
        return FheBool(fn(self.ct, int(other)))

    def gt(self, other):
        if isinstance(other, _FheUintBase):
            fn = _sk().gt_signed if self.SIGNED else _sk().gt
            return FheBool(fn(self.ct, other.ct))
        fn = _sk().scalar_gt_signed if self.SIGNED else _sk().scalar_gt
        return FheBool(fn(self.ct, int(other)))

    def ge(self, other):
        if isinstance(other, _FheUintBase):
            fn = _sk().ge_signed if self.SIGNED else _sk().ge
            return FheBool(fn(self.ct, other.ct))
        fn = _sk().scalar_ge_signed if self.SIGNED else _sk().scalar_ge
        return FheBool(fn(self.ct, int(other)))

    __eq__ = eq
    __ne__ = ne
    __lt__ = lt
    __le__ = le
    __gt__ = gt
    __ge__ = ge
    __hash__ = None

    def _as_ct(self, other):
        """Lift a clear scalar to a trivial radix of this width."""
        if isinstance(other, _FheUintBase):
            return other.ct
        w = self.NUM_BITS
        return _sk().create_trivial_radix(int(other) % (1 << w),
                                          self.ct.num_blocks,
                                          self.ct.batch_shape)

    def min(self, other):
        fn = _sk().min_signed if self.SIGNED else _sk().min
        return self._wrap(fn(self.ct, self._as_ct(other)))

    def max(self, other):
        fn = _sk().max_signed if self.SIGNED else _sk().max
        return self._wrap(fn(self.ct, self._as_ct(other)))

    def overflowing_add(self, other):
        """(wrapped sum, overflow flag) — reference overflowing_add."""
        fn = (_sk().signed_overflowing_add if self.SIGNED
              else _sk().unsigned_overflowing_add)
        s, ov = fn(self.ct, self._as_ct(other))
        return self._wrap(s), FheBool(ov)

    def overflowing_sub(self, other):
        fn = (_sk().signed_overflowing_sub if self.SIGNED
              else _sk().unsigned_overflowing_sub)
        d, ov = fn(self.ct, self._as_ct(other))
        return self._wrap(d), FheBool(ov)

    def cast_into(self, target_cls, ck_blocks_hint: int = None):
        """Width cast (reference cast_into): resize the block list."""
        bits_per_block = int(math.log2(self.ct.message_modulus))
        nb = target_cls.NUM_BITS // bits_per_block
        return target_cls(_sk().cast_to_size(self.ct, nb))

    @classmethod
    def encrypt_with_public_key(cls, values, pk: "PublicKey", seed: int = 0):
        """reference FheUint::try_encrypt(clear, &PublicKey)."""
        bits = int(math.log2(pk.params.message_modulus))
        return cls(pk.encrypt_radix(values, cls.NUM_BITS // bits, seed=seed))

    @classmethod
    def encrypt_with_compact_public_key(cls, values, pk: "CompactPublicKey",
                                        seed: int = 0):
        bits = int(math.log2(pk.params.message_modulus))
        return cls(pk.encrypt_radix(values, cls.NUM_BITS // bits, seed=seed))

    @classmethod
    def encrypt_compressed(cls, values, ck: ClientKey, seed: int = 1):
        """reference CompressedFheUint::try_encrypt — seeded blocks, masks
        regenerate on decompression."""
        return CompressedFheUint.encrypt(values, ck, cls, seed=seed)


class CompressedFheUint:
    """Seeded radix ciphertext: each block stores only its body + the mask
    seed (reference CompressedFheUint / CompressedRadixCiphertext)."""

    def __init__(self, seeded_blocks, fhe_cls, params):
        self.seeded_blocks = seeded_blocks
        self.fhe_cls = fhe_cls
        self.params = params

    @classmethod
    def encrypt(cls, values, ck: ClientKey, fhe_cls, seed: int = 1):
        from ..core.algorithms.seeded import encrypt_lwe_seeded
        sck = ck.shortint_ck
        p = sck.params
        m = p.message_modulus
        nb = fhe_cls.num_blocks(ck)
        from ..shortint.client_key import delta_for
        vals = np.asarray(values, dtype=object).reshape(-1) % (m ** nb)
        shape = np.shape(values)
        blocks = []
        for i in range(nb):
            bv = jnp.asarray(((vals // m ** i) % m).astype(np.uint64)).reshape(shape)
            blocks.append(encrypt_lwe_seeded(seed * 4099 + i, sck.encryption_key,
                                             bv * delta_for(p),
                                             sck.encryption_noise_std, 64))
        return cls(blocks, fhe_cls, p)

    def decompress(self):
        from ..core.algorithms.seeded import decompress_lwe
        from ..integer.ciphertext import RadixCiphertext
        from ..shortint.ciphertext import Ciphertext as Block
        from ..shortint.ciphertext import NoiseLevel
        p = self.params
        blocks = [Block(lwe=decompress_lwe(s), degree=p.message_modulus - 1,
                        message_modulus=p.message_modulus,
                        carry_modulus=p.carry_modulus,
                        noise_level=NoiseLevel.NOMINAL)
                  for s in self.seeded_blocks]
        return self.fhe_cls(RadixCiphertext(blocks=blocks))


class FheBool:
    """reference FheBool — a 1-block 0/1 value."""

    def __init__(self, block: "integer.ciphertext.BooleanBlock"):
        self.block = block

    @classmethod
    def encrypt(cls, values, ck: ClientKey, seed: int = 0):
        from ..integer.ciphertext import BooleanBlock
        msgs = jnp.asarray(values).astype(jnp.uint64) % jnp.uint64(2)
        return cls(BooleanBlock(block=ck.shortint_ck.encrypt(msgs, seed=seed)))

    def decrypt(self, ck: ClientKey):
        return np.asarray(ck.shortint_ck.decrypt(self.block.block)).astype(bool)

    def select(self, then_val: _FheUintBase, else_val: _FheUintBase):
        """reference if_then_else."""
        return type(then_val)(_sk().cmux(self.block, then_val.ct, else_val.ct))

    if_then_else = select

    def __and__(self, other):
        sk = _sk().key
        return FheBool(type(self.block)(
            block=sk.bitand(self.block.block, other.block.block)))

    def __or__(self, other):
        sk = _sk().key
        return FheBool(type(self.block)(
            block=sk.bitor(self.block.block, other.block.block)))

    def __xor__(self, other):
        sk = _sk().key
        return FheBool(type(self.block)(
            block=sk.bitxor(self.block.block, other.block.block)))

    def __invert__(self):
        sk = _sk().key
        return FheBool(type(self.block)(
            block=sk.evaluate_univariate(self.block.block, lambda x: 1 - (x % 2))))

    def eq(self, other):
        return ~(self ^ other)

    def ne(self, other):
        return self ^ other


def _make_type(name, bits, signed=False):
    t = type(name, (_FheUintBase,), {"NUM_BITS": bits, "SIGNED": signed})
    t.__module__ = __name__
    return t


FheUint2 = _make_type("FheUint2", 2)
FheUint4 = _make_type("FheUint4", 4)
FheUint8 = _make_type("FheUint8", 8)
FheUint16 = _make_type("FheUint16", 16)
FheUint32 = _make_type("FheUint32", 32)
FheUint64 = _make_type("FheUint64", 64)
FheUint128 = _make_type("FheUint128", 128)
FheUint256 = _make_type("FheUint256", 256)
FheInt8 = _make_type("FheInt8", 8, signed=True)
FheInt16 = _make_type("FheInt16", 16, signed=True)
FheInt32 = _make_type("FheInt32", 32, signed=True)
FheInt64 = _make_type("FheInt64", 64, signed=True)
FheInt128 = _make_type("FheInt128", 128, signed=True)
FheInt256 = _make_type("FheInt256", 256, signed=True)
