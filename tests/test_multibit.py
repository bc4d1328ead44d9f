"""Multi-bit PBS tests (the analogue of
core_crypto/algorithms/test/lwe_multi_bit_programmable_bootstrapping.rs)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT, MultiBitPBSParameters

TEST_PARAMS_MULTIBIT = MultiBitPBSParameters(
    name="TEST_PARAMS_MULTIBIT",
    grouping_factor=2,
    **{f.name: getattr(TEST_PARAMS_SHORTINT, f.name)
       for f in dataclasses.fields(TEST_PARAMS_SHORTINT)
       if f.name not in ("name", "ciphertext_modulus")})


@pytest.fixture(scope="module")
def mkeys():
    return shortint.gen_keys(TEST_PARAMS_MULTIBIT, seed=51)


def test_multibit_bsk_structure(mkeys):
    _, sk = mkeys
    from tfhe_tpu.core.algorithms.multi_bit import NttMultiBitBootstrapKey
    assert isinstance(sk.bsk, NttMultiBitBootstrapKey)
    assert sk.bsk.num_groups == TEST_PARAMS_MULTIBIT.lwe_dimension // 2
    assert sk.bsk.data.shape[1] == 4  # 2^grouping_factor GGSWs per group


def test_multibit_pbs_lut(mkeys):
    ck, sk = mkeys
    M = TEST_PARAMS_MULTIBIT.message_modulus
    msgs = jnp.arange(M, dtype=jnp.uint64)
    ct = ck.encrypt(msgs, seed=1)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % M)
    out = sk.apply_lookup_table(ct, lut)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(out)),
                                  (3 * np.arange(M) + 1) % M)


def test_multibit_ops(mkeys):
    ck, sk = mkeys
    M = TEST_PARAMS_MULTIBIT.message_modulus
    a = np.array([1, 2, 3, 0])
    b = np.array([2, 3, 1, 1])
    ca, cb = ck.encrypt(jnp.asarray(a), seed=2), ck.encrypt(jnp.asarray(b), seed=3)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.add(ca, cb))),
                                  (a + b) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.mul(ca, cb))),
                                  (a * b) % M)
