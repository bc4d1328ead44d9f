"""Integer division tests (restoring long division, reference div_rem)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT


@pytest.fixture(scope="module")
def dkeys():
    # 2 blocks x 2 bits = 4-bit integers keep the long division fast on CPU
    return integer.gen_keys(TEST_PARAMS_SHORTINT, num_blocks=2, seed=81)


def test_div_rem(dkeys):
    ck, sk = dkeys
    a = np.array([7, 13, 15, 4])
    b = np.array([2, 3, 4, 5])
    ca = ck.encrypt(jnp.asarray(a), seed=1)
    cb = ck.encrypt(jnp.asarray(b), seed=2)
    q, r = sk.div_rem(ca, cb)
    np.testing.assert_array_equal(ck.decrypt(q), a // b)
    np.testing.assert_array_equal(ck.decrypt(r), a % b)


def test_div_by_zero_convention(dkeys):
    """Encrypted zero divisor follows the reference convention on BOTH
    divider paths: quotient all-ones (sub never underflows), remainder a."""
    ck, sk = dkeys
    ca = ck.encrypt(jnp.asarray([9]), seed=3)
    cb = ck.encrypt(jnp.asarray([0]), seed=4)
    q, r = sk.div_rem(ca, cb)          # 4-bit: unrolled path
    assert int(ck.decrypt(r)[0]) == 9
    assert int(ck.decrypt(q)[0]) == 15


def test_div_by_zero_convention_scan(dkeys):
    """The lax.scan divider (>= 8 bits) must apply the same x/0 convention
    as the unrolled path (its carry-out trick alone would report q=0)."""
    ck0, sk = dkeys
    rck = integer.RadixClientKey(key=ck0.key, num_blocks=4)   # 8 bits
    a = np.array([200, 9], dtype=np.uint64)
    b = np.array([0, 3], dtype=np.uint64)
    ca = rck.encrypt(jnp.asarray(a), seed=7)
    cb = rck.encrypt(jnp.asarray(b), seed=8)
    q, r = sk.div_rem(ca, cb)
    np.testing.assert_array_equal(np.asarray(rck.decrypt(q)), [255, 3])
    np.testing.assert_array_equal(np.asarray(rck.decrypt(r)), [200, 0])


def test_div_rem_scan_wide(dkeys):
    """Widths past 16 bits route through the lax.scan round (the unrolled
    program is too large for the remote AOT compile at 32 bits); the scan
    divider must agree with the clear model."""
    ck0, sk = dkeys
    rck = integer.RadixClientKey(key=ck0.key, num_blocks=9)   # 18 bits
    a = np.array([260001, 77, 131072], dtype=np.uint64)
    b = np.array([7, 260000, 255], dtype=np.uint64)
    ca = rck.encrypt(jnp.asarray(a), seed=5)
    cb = rck.encrypt(jnp.asarray(b), seed=6)
    q, r = sk.div_rem(ca, cb)
    np.testing.assert_array_equal(np.asarray(rck.decrypt(q)), a // b)
    np.testing.assert_array_equal(np.asarray(rck.decrypt(r)), a % b)
