"""Example-app integration tests (analogues of the reference's
examples/ — dark_market, regex_engine, sha256_bool primitives)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import boolean as B
from tfhe_tpu import integer
from tfhe_tpu.core.params import TEST_PARAMS_BOOLEAN, TEST_PARAMS_SHORTINT
from tfhe_tpu.examples import dark_market, regex_engine, sha256_bool


@pytest.fixture(scope="module")
def ikeys():
    return integer.gen_keys(TEST_PARAMS_SHORTINT, num_blocks=4, seed=71)


def test_dark_market_volume_match(ikeys):
    ck, sk = ikeys
    buys = [10, 4, 6]
    sells = [5, 9]
    enc_buys = [ck.encrypt(jnp.asarray(v), seed=100 + i) for i, v in enumerate(buys)]
    enc_sells = [ck.encrypt(jnp.asarray(v), seed=200 + i) for i, v in enumerate(sells)]
    fb, fs = dark_market.volume_match(sk, enc_buys, enc_sells)
    got_b = [int(ck.decrypt(x)) for x in fb]
    got_s = [int(ck.decrypt(x)) for x in fs]
    # matched volume = min(20, 14) = 14, filled greedily
    assert got_b == [10, 4, 0]
    assert got_s == [5, 9]


def test_dark_market_parallel(ikeys):
    """Improved parallel variant (improved_parallel_fhe.rs:97): order book
    batched onto the PBS axis, verified against the clear model."""
    ck, sk = ikeys
    buys = [10, 4, 6]
    sells = [5, 9, 2, 7]
    cb = ck.encrypt(jnp.asarray(buys), seed=110)
    cs = ck.encrypt(jnp.asarray(sells), seed=111)
    fb, fs = dark_market.volume_match_parallel(sk, cb, cs)

    def clear_fill(orders, other_total):
        pre, out = 0, []
        for o in orders:
            out.append(min(o, max(0, other_total - pre)))
            pre += o
        return out

    np.testing.assert_array_equal(np.asarray(ck.decrypt(fs)),
                                  clear_fill(sells, sum(buys)))
    np.testing.assert_array_equal(np.asarray(ck.decrypt(fb)),
                                  clear_fill(buys, sum(sells)))


def test_regex_engine(ikeys):
    ck, sk = ikeys

    def match(pattern, text):
        enc = [ck.encrypt(jnp.asarray(ord(c)), seed=300 + i)
               for i, c in enumerate(text)]
        out = regex_engine.regex_match_radix(sk, pattern, enc)
        return bool(int(np.asarray(ck.key.decrypt(out))) & 1)

    assert match("ab", "ab") is True
    assert match("ab", "ac") is False
    assert match("a[bc]", "ac") is True
    assert match("a|b", "b") is True
    assert match("ab?", "a") is True


def test_regex_engine_extended_syntax(ikeys):
    """Reference parser.rs feature set: /pat/ substring semantics, ^/$
    anchors, `i` flag, escapes, negated classes, counted repetition."""
    ck, sk = ikeys

    def match(pattern, text):
        # each match compiles many small XLA programs; clearing between
        # patterns avoids the documented XLA-CPU cumulative-compile segfault
        import jax
        jax.clear_caches()
        enc = [ck.encrypt(jnp.asarray(ord(c)), seed=400 + i)
               for i, c in enumerate(text)]
        out = regex_engine.regex_match_radix(sk, pattern, enc)
        return bool(int(np.asarray(ck.key.decrypt(out))) & 1)

    # substring (has_match) semantics and anchors
    assert match("/b/", "abc") is True
    assert match("/^b/", "abc") is False
    assert match("/c$/", "abc") is True
    assert match("/b$/", "abc") is False
    # case-insensitive flag
    assert match("/^aB$/i", "Ab") is True
    assert match("/^aB$/", "Ab") is False
    # escapes (literal dot, not any-char)
    assert match(r"/^a\.$/", "ab") is False
    # negated classes
    assert match("/^a[^bc]$/", "ad") is True
    assert match("/^a[^bc]$/", "ab") is False
    # counted repetition {n}, {n,m}, {n,}
    assert match("/^a{2}$/", "aa") is True
    assert match("/^a{1,2}b$/", "aab") is True
    assert match("/^a{2,}$/", "a") is False


def test_sha256_word_primitives():
    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=72)
    params = ck.params
    a_val, b_val = 0x12345678, 0x9ABCDEF0
    a = sha256_bool.encrypt_word(ck, a_val, seed=1)
    b = sha256_bool.trivial_word(params, b_val)

    assert sha256_bool.decrypt_word(ck, sha256_bool.rotr(a, 7)) == \
        ((a_val >> 7) | (a_val << 25)) & 0xFFFFFFFF
    assert sha256_bool.decrypt_word(ck, sha256_bool.shr(a, 3, params)) == a_val >> 3
    assert sha256_bool.decrypt_word(ck, sha256_bool.xor_words(sk, a, b)) == \
        a_val ^ b_val
    assert sha256_bool.decrypt_word(ck, sha256_bool.add_words(sk, a, b, params)) == \
        (a_val + b_val) & 0xFFFFFFFF


def test_sha256_sigma():
    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=73)
    params = ck.params
    v = 0x6a09e667
    w = sha256_bool.trivial_word(params, v)
    expect = (((v >> 7) | (v << 25)) ^ ((v >> 18) | (v << 14)) ^ (v >> 3)) & 0xFFFFFFFF
    got = sha256_bool.decrypt_word(ck, sha256_bool.small_sigma0(sk, w, params))
    assert got == expect


def test_sha256_padding_known_answer():
    """The reference padding.rs test vector, plus hex-input parsing."""
    s = "abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq"
    expect = ("6162636462636465636465666465666765666768666768696768696a68696a"
              "6b696a6b6c6a6b6c6d6b6c6d6e6c6d6e6f6d6e6f706e6f707180"
              + "0" * 139 + "1c0")
    got = sha256_bool.bools_to_hex(sha256_bool.pad_sha256_input(s))
    assert got == expect
    # hex input parses to the same bytes as the text form
    assert (sha256_bool.pad_sha256_input("0x6162") ==
            sha256_bool.pad_sha256_data(b"ab"))
    assert len(sha256_bool.pad_sha256_data(b"abc")) == 512


def test_sha256_batched_word_ops():
    """The batched word form (bits on the boolean batch axis) agrees with
    the clear model on rotr/shr/add (Kogge-Stone prefix adder)."""
    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=74)
    params = ck.params
    a_val, b_val = 0xDEADBEEF, 0x12345678
    import jax.numpy as jnp
    a = B.encrypt(ck, jnp.asarray([bool((a_val >> i) & 1) for i in range(32)]),
                  seed=5)
    b = sha256_bool.trivial_word_b(params, b_val)
    assert sha256_bool.decrypt_word_b(ck, sha256_bool.rotr_b(a, 11)) == \
        ((a_val >> 11) | (a_val << 21)) & 0xFFFFFFFF
    assert sha256_bool.decrypt_word_b(
        ck, sha256_bool.shr_b(a, 5, params)) == a_val >> 5
    assert sha256_bool.decrypt_word_b(
        ck, sha256_bool.add_words_b(sk, a, b, params)) == \
        (a_val + b_val) & 0xFFFFFFFF
    assert sha256_bool.decrypt_word_b(
        ck, sha256_bool.maj_b(sk, a, b, b)) == \
        ((a_val & b_val) | (a_val & b_val) | (b_val & b_val)) & 0xFFFFFFFF


def test_sha256_full_message_known_answer():
    """End-to-end: pad b'abc', encrypt the 512 padded bits in one batched
    call, run the full 64-round driver, decrypt the known SHA-256 digest
    (reference main.rs flow)."""
    import hashlib

    import jax.numpy as jnp
    import numpy as np
    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=75)
    params = ck.params
    bits = sha256_bool.pad_sha256_input("abc")
    enc = B.encrypt(ck, jnp.asarray(bits), seed=6)
    digest = sha256_bool.sha256_fhe(sk, params, enc)
    out_bits = np.asarray(B.decrypt(ck, digest)).astype(bool)
    got = sha256_bool.bools_to_hex(list(out_bits))
    assert got == hashlib.sha256(b"abc").hexdigest()
