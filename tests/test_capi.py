"""Flat C-style API surface tests (reference c_api analogue)."""
import numpy as np
import pytest

from tfhe_tpu import capi


def test_capi_flow():
    from tfhe_tpu import hlapi, shortint, integer
    from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
    ck_s, sk_s = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=61)
    ck_h = capi._new(hlapi.ClientKey(ck_s))
    sk_h = capi._new(hlapi.ServerKey(integer.ServerKey(key=sk_s)))
    assert capi.set_server_key(sk_h) == capi.OK

    st, a = capi.fheuint8_try_encrypt_with_client_key(57, ck_h, seed=1)
    assert st == capi.OK
    st, b = capi.fheuint8_try_encrypt_with_client_key(13, ck_h, seed=2)
    assert st == capi.OK

    st, c = capi.fheuint8_add(a, b)
    assert st == capi.OK
    st, v = capi.fheuint8_decrypt(c, ck_h)
    assert (st, v) == (capi.OK, 70)

    st, d = capi.fheuint8_scalar_add(a, 3)
    st, v = capi.fheuint8_decrypt(d, ck_h)
    assert v == 60

    st, blob = capi.serialize(a)
    assert st == capi.OK and len(blob) > 0
    st, a2 = capi.deserialize_fheuint8(blob)
    st, v = capi.fheuint8_decrypt(a2, ck_h)
    assert v == 57

    assert capi.destroy(a) == capi.OK
    assert capi.destroy(a) == capi.ERR  # double destroy reports an error
