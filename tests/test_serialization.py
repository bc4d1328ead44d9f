"""Serialization, seeded/compressed entities, key cache, multichip dry run."""
import io

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core import rng
from tfhe_tpu.core.algorithms import (decrypt_lwe, generate_glwe_secret_key,
                                      generate_lwe_secret_key)
from tfhe_tpu.core.algorithms.seeded import (decompress_bootstrap_key,
                                             decompress_lwe,
                                             encrypt_lwe_seeded,
                                             generate_seeded_bootstrap_key)
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT as P
from tfhe_tpu.utils import (DeserializationError, KeyCache, load, safe_load,
                            save, secure_seed)


def test_seeded_lwe_roundtrip():
    sk = generate_lwe_secret_key(rng.key_from_seed(1), P.lwe_dimension)
    delta = np.uint64(1) << np.uint64(59)
    msgs = jnp.arange(8, dtype=jnp.uint64) * delta
    sct = encrypt_lwe_seeded(77, sk, msgs, P.lwe_noise_std, 64)
    assert sct.body.shape == (8,)          # n+1 -> 1 compression
    full = decompress_lwe(sct)
    dec = decrypt_lwe(full, sk, 64)
    got = np.asarray((dec + (delta >> np.uint64(1))) // delta) % 32
    np.testing.assert_array_equal(got, np.arange(8))


def test_seeded_bsk_roundtrip():
    lwe_sk = generate_lwe_secret_key(rng.key_from_seed(2), 8)
    glwe_sk = generate_glwe_secret_key(rng.key_from_seed(3), 1, 64)
    full, seeded = generate_seeded_bootstrap_key(
        55, lwe_sk, glwe_sk, P.pbs_decomp, P.glwe_noise_std, 64)
    assert seeded.bodies.nbytes * 2 == full.data.nbytes  # k=1: half the size
    rebuilt = decompress_bootstrap_key(seeded)
    np.testing.assert_array_equal(np.asarray(rebuilt.data),
                                  np.asarray(full.data))


def test_seeded_glwe_roundtrip():
    from tfhe_tpu.core.algorithms import decrypt_glwe
    from tfhe_tpu.core.algorithms.seeded import (decompress_glwe,
                                                 encrypt_glwe_seeded)
    sk = generate_glwe_secret_key(rng.key_from_seed(4), 2, 64)
    delta = np.uint64(1) << np.uint64(59)
    pts = (jnp.arange(3 * 64, dtype=jnp.uint64) % 8).reshape(3, 64) * delta
    sct = encrypt_glwe_seeded(78, sk, pts, P.glwe_noise_std, 64)
    assert sct.body.shape == (3, 64)       # (k+1)N -> N compression
    dec = decrypt_glwe(decompress_glwe(sct), sk, 64)
    got = (np.asarray(dec) + (delta >> np.uint64(1))) // delta % 32
    np.testing.assert_array_equal(got, np.asarray(pts) // delta)


def test_seeded_ggsw_list_roundtrip():
    from tfhe_tpu.core.algorithms.seeded import (decompress_ggsw_list,
                                                 generate_seeded_ggsw_list)
    glwe_sk = generate_glwe_secret_key(rng.key_from_seed(5), 1, 64)
    full, seeded = generate_seeded_ggsw_list(
        56, glwe_sk, jnp.asarray([0, 1, 1]), P.pbs_decomp, P.glwe_noise_std, 64)
    assert seeded.bodies.nbytes * 2 == full.nbytes
    rebuilt = decompress_ggsw_list(seeded)
    for i, g in enumerate(rebuilt):
        np.testing.assert_array_equal(np.asarray(g.data), np.asarray(full[i]))


def test_seeded_multi_bit_bsk_roundtrip():
    from tfhe_tpu.core.algorithms.seeded import (
        decompress_multi_bit_bootstrap_key,
        generate_seeded_multi_bit_bootstrap_key)
    lwe_sk = generate_lwe_secret_key(rng.key_from_seed(6), 8)
    glwe_sk = generate_glwe_secret_key(rng.key_from_seed(7), 1, 64)
    full, seeded = generate_seeded_multi_bit_bootstrap_key(
        57, lwe_sk, glwe_sk, P.pbs_decomp, 2, P.glwe_noise_std, 64)
    rebuilt = decompress_multi_bit_bootstrap_key(seeded)
    np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(full))


def test_seeded_pksk_roundtrip():
    from tfhe_tpu.core.algorithms.seeded import (
        decompress_packing_keyswitch_key,
        generate_seeded_packing_keyswitch_key)
    from tfhe_tpu.core.params import DecompParams
    in_sk = generate_lwe_secret_key(rng.key_from_seed(8), 16)
    out_sk = generate_glwe_secret_key(rng.key_from_seed(9), 2, 64)
    full, seeded = generate_seeded_packing_keyswitch_key(
        58, in_sk, out_sk, DecompParams(base_log=4, level=8),
        P.glwe_noise_std, 64)
    rebuilt = decompress_packing_keyswitch_key(seeded)
    np.testing.assert_array_equal(np.asarray(rebuilt.data),
                                  np.asarray(full.data))


def test_seeded_public_keys_roundtrip():
    from tfhe_tpu.core.algorithms.seeded import (
        decompress_compact_public_key, decompress_lwe_public_key,
        generate_seeded_compact_public_key, generate_seeded_lwe_public_key)
    sk = generate_lwe_secret_key(rng.key_from_seed(10), 64)
    full, seeded = generate_seeded_lwe_public_key(59, sk, 20, 2.0**20, 64)
    rebuilt = decompress_lwe_public_key(seeded)
    np.testing.assert_array_equal(np.asarray(rebuilt.data),
                                  np.asarray(full.data))
    assert seeded.bodies.nbytes * 65 == full.data.nbytes

    fullc, seededc = generate_seeded_compact_public_key(60, sk, 2.0**20, 64)
    rebuiltc = decompress_compact_public_key(seededc)
    np.testing.assert_array_equal(np.asarray(rebuiltc.data),
                                  np.asarray(fullc.data))


def test_seeded_entity_serialization(tmp_path):
    from tfhe_tpu.core.algorithms.seeded import (decompress_ggsw_list,
                                                 generate_seeded_ggsw_list)
    glwe_sk = generate_glwe_secret_key(rng.key_from_seed(11), 1, 64)
    full, seeded = generate_seeded_ggsw_list(
        61, glwe_sk, jnp.asarray([1, 0]), P.pbs_decomp, P.glwe_noise_std, 64)
    p = tmp_path / "sggsw.npz"
    save(seeded, p)
    s2 = load(p)
    assert s2.seed == seeded.seed and s2.decomp == seeded.decomp
    rebuilt = decompress_ggsw_list(s2)
    np.testing.assert_array_equal(np.asarray(rebuilt[0].data),
                                  np.asarray(full[0]))


def test_save_load_roundtrip(tmp_path):
    from tfhe_tpu import shortint
    from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
    ck, sk = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=5)
    ct = ck.encrypt(jnp.asarray([1, 2, 3]), seed=6)
    p = tmp_path / "ct.npz"
    save(ct, p)
    ct2 = load(p)
    assert ct2.degree == ct.degree
    np.testing.assert_array_equal(np.asarray(ck.decrypt(ct2)), [1, 2, 3])

    kp = tmp_path / "ck.npz"
    save(ck, kp)
    ck2 = load(kp)
    np.testing.assert_array_equal(np.asarray(ck2.decrypt(ct)), [1, 2, 3])
    assert ck2.params == ck.params


def test_safe_load_checks(tmp_path):
    from tfhe_tpu import shortint
    from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
    ck, _ = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=7)
    ct = ck.encrypt(jnp.asarray([1]), seed=8)
    p = tmp_path / "x.npz"
    save(ct, p)
    safe_load(p, expected_type="Ciphertext")
    with pytest.raises(DeserializationError):
        safe_load(p, expected_type="ServerKey")
    with pytest.raises(DeserializationError):
        safe_load(p, expected_type="Ciphertext",
                  conformance=lambda c: c.message_modulus == 999)


def test_gadget_ciphertext_serialization(tmp_path):
    from tfhe_tpu.gadget import Encoding
    from tfhe_tpu.gadget.engine import Ciphertext
    from tfhe_tpu.core.entities import LweCiphertext
    enc = Encoding.new_canonical_binary(1, 5)
    ct = Ciphertext(lwe=LweCiphertext(data=jnp.arange(5, dtype=jnp.uint64)),
                    encoding=enc)
    p = tmp_path / "g.npz"
    save(ct, p)
    ct2 = load(p)
    assert ct2.encoding == enc


def test_keycache(tmp_path):
    calls = []

    def gen():
        calls.append(1)
        from tfhe_tpu.core.entities import LweSecretKey
        return LweSecretKey(bits=jnp.ones(4, dtype=jnp.int8))

    kc = KeyCache(root=str(tmp_path / "kc"))
    a = kc.get("TESTKEY", gen)
    kc._mem.clear()
    b = kc.get("TESTKEY", gen)
    assert len(calls) == 1
    np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))


def test_secure_seed():
    s1, s2 = secure_seed(), secure_seed()
    assert 0 <= s1 < 2 ** 32 and s1 != s2 or s1 != secure_seed()


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entry
    entry.dryrun_multichip(8)


def test_compressed_server_key():
    from tfhe_tpu import shortint
    from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
    from tfhe_tpu.shortint.server_key import gen_compressed_server_key
    ck, _ = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=85)
    csk = gen_compressed_server_key(ck, seed=86)
    sk2 = csk.decompress()
    msgs = jnp.asarray([0, 1, 2, 3], dtype=jnp.uint64)
    ct = ck.encrypt(msgs, seed=87)
    lut = sk2.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sk2.apply_lookup_table(ct, lut)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(out)),
                                  (np.arange(4) + 1) % 4)

    # wire round trip: the compressed key itself serializes (that is its
    # purpose — reference CompressedServerKey is a serde artifact) and is
    # much smaller than the expanded server key
    buf = io.BytesIO()
    save(csk, buf)
    compressed_bytes = buf.getbuffer().nbytes
    buf.seek(0)
    csk2 = load(buf)
    sk3 = csk2.decompress()
    out3 = sk3.apply_lookup_table(ct, lut)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(out3)),
                                  (np.arange(4) + 1) % 4)
    buf2 = io.BytesIO()
    save(sk2, buf2)
    assert compressed_bytes * 5 < buf2.getbuffer().nbytes


def test_boolean_public_key():
    from tfhe_tpu import boolean as B
    from tfhe_tpu.core.params import TEST_PARAMS_BOOLEAN
    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=88)
    pk = B.gen_public_key(ck, seed=89)
    msgs = jnp.asarray([True, False, True])
    ct = B.encrypt_with_public_key(pk, msgs, seed=90)
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck, ct)), np.asarray(msgs))
    out = B.and_(sk, ct, B.encrypt(ck, jnp.asarray([True, True, False]), seed=91))
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck, out)), [True, False, False])


def test_compact_public_key():
    from tfhe_tpu.core import rng as crng
    from tfhe_tpu.core.algorithms import decrypt_lwe, generate_lwe_secret_key
    from tfhe_tpu.core.algorithms.public_key import (
        encrypt_lwe_compact_batch, generate_lwe_compact_public_key)
    sk = generate_lwe_secret_key(crng.key_from_seed(92), 64)
    pk = generate_lwe_compact_public_key(crng.key_from_seed(93), sk, 2.0**20, 64)
    delta = np.uint64(1) << np.uint64(60)
    pts = jnp.arange(8, dtype=jnp.uint64) * delta
    cts = encrypt_lwe_compact_batch(crng.key_from_seed(94), pk, pts, 2.0**20)
    dec = decrypt_lwe(cts, sk, 64)
    got = np.asarray((dec + (delta >> np.uint64(1))) // delta) % 16
    np.testing.assert_array_equal(got, np.arange(8))


def test_shared_array_dedup_roundtrip():
    """Composite keys holding several references to the same array store it
    ONCE and share the loaded object (the shift key's three compute-BSK
    references tripled the cache entry before this)."""
    import io
    from tfhe_tpu.core.entities import LweKeyswitchKey
    from tfhe_tpu.core.params import DecompParams
    from tfhe_tpu.utils import serialization
    arr = jnp.arange(4096, dtype=jnp.uint64).reshape(16, 16, 16)
    k = LweKeyswitchKey(data=arr, decomp=DecompParams(3, 5))
    one, three = io.BytesIO(), io.BytesIO()
    serialization.save([k], one, compress=False)
    serialization.save([k, k, k], three, compress=False)
    assert three.getbuffer().nbytes < one.getbuffer().nbytes + 2048
    three.seek(0)
    loaded = serialization.load(three)
    np.testing.assert_array_equal(np.asarray(loaded[2].data), np.asarray(arr))
    assert loaded[0].data is loaded[1].data          # shared on load too
