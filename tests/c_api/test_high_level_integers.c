/* C client for the tfhe_tpu C API — the analogue of the reference's
 * tfhe/c_api_tests/test_high_level_integers.c, built and run by
 * tests/test_capi_native.py.  Uses the tiny insecure TEST parameter set so
 * the whole flow (keygen + FheUint8 ops) finishes quickly on CPU. */
#include <assert.h>
#include <stdio.h>
#include <stdlib.h>

#include "tfhe_tpu.h"

#define CHECK(expr)                                                       \
  do {                                                                    \
    tfhe_status st_ = (expr);                                             \
    if (st_ != 0) {                                                       \
      fprintf(stderr, "FAILED %s: %s\n", #expr, tfhe_tpu_last_error());   \
      return 1;                                                           \
    }                                                                     \
  } while (0)

int main(void) {
  tfhe_handle cfg = 0, ck = 0, sk = 0;
  tfhe_handle a = 0, b = 0, sum = 0, prod = 0, band = 0, eq = 0, sadd = 0;
  uint8_t clear = 0;

  CHECK(tfhe_tpu_init());
  CHECK(tfhe_config_builder_custom("TEST_PARAMS_SHORTINT", &cfg));
  CHECK(tfhe_generate_keys(cfg, /*seed=*/42, &ck, &sk));
  CHECK(tfhe_set_server_key(sk));

  CHECK(tfhe_fheuint8_try_encrypt_with_client_key_u8(23, ck, &a));
  CHECK(tfhe_fheuint8_try_encrypt_with_client_key_u8(9, ck, &b));

  CHECK(tfhe_fheuint8_add(a, b, &sum));
  CHECK(tfhe_fheuint8_decrypt(sum, ck, &clear));
  assert(clear == 32);

  CHECK(tfhe_fheuint8_mul(a, b, &prod));
  CHECK(tfhe_fheuint8_decrypt(prod, ck, &clear));
  assert(clear == (uint8_t)(23 * 9));

  CHECK(tfhe_fheuint8_bitand(a, b, &band));
  CHECK(tfhe_fheuint8_decrypt(band, ck, &clear));
  assert(clear == (23 & 9));

  CHECK(tfhe_fheuint8_eq(a, a, &eq));
  CHECK(tfhe_fheuint8_decrypt(eq, ck, &clear));
  assert(clear == 1);

  CHECK(tfhe_fheuint8_scalar_add(a, 100, &sadd));
  CHECK(tfhe_fheuint8_decrypt(sadd, ck, &clear));
  assert(clear == 123);

  /* serialization round trip */
  uint8_t *buf = NULL;
  size_t len = 0;
  tfhe_handle a2 = 0;
  CHECK(tfhe_serialize(a, &buf, &len));
  assert(len > 0);
  CHECK(tfhe_deserialize_fheuint8(buf, len, &a2));
  tfhe_buffer_destroy(buf);
  CHECK(tfhe_fheuint8_decrypt(a2, ck, &clear));
  assert(clear == 23);

  CHECK(tfhe_destroy(a));
  CHECK(tfhe_destroy(b));
  CHECK(tfhe_destroy(sum));
  CHECK(tfhe_destroy(prod));
  CHECK(tfhe_destroy(band));
  CHECK(tfhe_destroy(eq));
  CHECK(tfhe_destroy(sadd));
  CHECK(tfhe_destroy(a2));

  /* wider widths (the reference's c_api test drives u8..u256) ------------ */
  {
    tfhe_handle x = 0, y = 0, s16 = 0;
    uint16_t v16 = 0;
    CHECK(tfhe_fheuint16_try_encrypt_with_client_key_u16(1234, ck, &x));
    CHECK(tfhe_fheuint16_try_encrypt_with_client_key_u16(4321, ck, &y));
    CHECK(tfhe_fheuint16_add(x, y, &s16));
    CHECK(tfhe_fheuint16_decrypt(s16, ck, &v16));
    assert(v16 == 5555);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(y));
    CHECK(tfhe_destroy(s16));
  }
  {
    tfhe_handle x = 0, y = 0, r = 0, x2 = 0;
    uint32_t v32 = 0;
    uint8_t *buf = NULL;
    size_t len = 0;
    CHECK(tfhe_fheuint32_try_encrypt_with_client_key_u32(0xCAFE1234u, ck, &x));
    CHECK(tfhe_fheuint32_try_encrypt_with_client_key_u32(0x00010001u, ck, &y));
    CHECK(tfhe_fheuint32_bitxor(x, y, &r));
    CHECK(tfhe_fheuint32_decrypt(r, ck, &v32));
    assert(v32 == (0xCAFE1234u ^ 0x00010001u));
    /* serialization across the ABI at 32 bits */
    CHECK(tfhe_serialize(x, &buf, &len));
    assert(len > 0);
    CHECK(tfhe_deserialize_fheuint32(buf, len, &x2));
    tfhe_buffer_destroy(buf);
    CHECK(tfhe_fheuint32_decrypt(x2, ck, &v32));
    assert(v32 == 0xCAFE1234u);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(y));
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_destroy(x2));
  }
  {
    tfhe_handle x = 0, r = 0;
    uint64_t v64 = 0;
    CHECK(tfhe_fheuint64_try_encrypt_with_client_key_u64(
        0xDEADBEEF00C0FFEEull, ck, &x));
    CHECK(tfhe_fheuint64_scalar_add(x, 0x11, &r));
    CHECK(tfhe_fheuint64_decrypt(r, ck, &v64));
    assert(v64 == 0xDEADBEEF00C0FFFFull);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(r));
  }

  /* 128-bit width (u64 word pairs) ----------------------------------------- */
  {
    tfhe_handle x = 0, y = 0, r = 0;
    uint64_t w0 = 0, w1 = 0;
    CHECK(tfhe_fheuint128_try_encrypt_with_client_key_u128(
        0x1111222233334444ull, 0x5555666677778888ull, ck, &x));
    CHECK(tfhe_fheuint128_try_encrypt_with_client_key_u128(
        0xFFFFFFFFFFFFFFFFull, 0x1ull, ck, &y));
    CHECK(tfhe_fheuint128_add(x, y, &r));
    CHECK(tfhe_fheuint128_decrypt(r, ck, &w0, &w1));
    assert(w0 == 0x1111222233334443ull);
    assert(w1 == 0x555566667777888Aull);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(y));
    CHECK(tfhe_destroy(r));
  }

  /* 256-bit width (four u64 words) ----------------------------------------- */
  {
    tfhe_handle x = 0, y = 0, r = 0;
    uint64_t w0 = 0, w1 = 0, w2 = 0, w3 = 0;
    CHECK(tfhe_fheuint256_try_encrypt_with_client_key_u256(
        0xFFFFFFFFFFFFFFFFull, 0x1ull, 0x2ull, 0x3ull, ck, &x));
    CHECK(tfhe_fheuint256_try_encrypt_with_client_key_u256(
        0x1ull, 0x0ull, 0x0ull, 0x0ull, ck, &y));
    CHECK(tfhe_fheuint256_add(x, y, &r));
    CHECK(tfhe_fheuint256_decrypt(r, ck, &w0, &w1, &w2, &w3));
    assert(w0 == 0 && w1 == 0x2ull && w2 == 0x2ull && w3 == 0x3ull);
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_fheuint256_bitxor(x, y, &r));
    CHECK(tfhe_fheuint256_decrypt(r, ck, &w0, &w1, &w2, &w3));
    assert(w0 == 0xFFFFFFFFFFFFFFFEull && w1 == 0x1ull && w2 == 0x2ull &&
           w3 == 0x3ull);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(y));
    CHECK(tfhe_destroy(r));
  }

  /* compressed server key, compact public key, compressed ciphertext ------- */
  {
    tfhe_handle csk = 0, sk2 = 0, pk = 0, cct = 0, ct = 0, pct = 0, s = 0;
    uint8_t v = 0;
    CHECK(tfhe_compressed_server_key_new(ck, 3, &csk));
    CHECK(tfhe_compressed_server_key_decompress(csk, &sk2));
    CHECK(tfhe_set_server_key(sk2));

    CHECK(tfhe_compressed_fheuint8_try_encrypt_with_client_key_u8(200, ck,
                                                                  &cct));
    CHECK(tfhe_compressed_fheuint8_decompress(cct, &ct));
    CHECK(tfhe_fheuint8_decrypt(ct, ck, &v));
    assert(v == 200);

    CHECK(tfhe_compact_public_key_new(ck, 2, &pk));
    CHECK(tfhe_fheuint8_try_encrypt_with_compact_public_key_u8(55, pk, &pct));
    /* the decompressed server key must operate on the pk-encrypted ct */
    CHECK(tfhe_fheuint8_add(ct, pct, &s));
    CHECK(tfhe_fheuint8_decrypt(s, ck, &v));
    assert(v == (uint8_t)(200 + 55));

    CHECK(tfhe_set_server_key(sk)); /* restore for later sections */
    CHECK(tfhe_destroy(csk));
    CHECK(tfhe_destroy(sk2));
    CHECK(tfhe_destroy(pk));
    CHECK(tfhe_destroy(cct));
    CHECK(tfhe_destroy(ct));
    CHECK(tfhe_destroy(pct));
    CHECK(tfhe_destroy(s));
  }

  /* signed integers through the ABI --------------------------------------- */
  {
    tfhe_handle x = 0, y = 0, r = 0, n = 0;
    int32_t v = 0;
    CHECK(tfhe_fheint32_try_encrypt_with_client_key_i32(-123456, ck, &x));
    CHECK(tfhe_fheint32_try_encrypt_with_client_key_i32(100000, ck, &y));
    CHECK(tfhe_fheint32_add(x, y, &r));
    CHECK(tfhe_fheint32_decrypt(r, ck, &v));
    assert(v == -23456);
    CHECK(tfhe_fheint32_neg(x, &n));
    CHECK(tfhe_fheint32_decrypt(n, ck, &v));
    assert(v == 123456);
    CHECK(tfhe_destroy(x));
    CHECK(tfhe_destroy(y));
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_destroy(n));
  }

  /* boolean scheme through the ABI ---------------------------------------- */
  {
    tfhe_handle bck = 0, bsk = 0, t = 0, f = 0, g = 0, m = 0;
    int v = -1;
    CHECK(tfhe_boolean_gen_keys("TEST_PARAMS_BOOLEAN", 7, &bck, &bsk));
    CHECK(tfhe_boolean_encrypt(1, bck, &t));
    CHECK(tfhe_boolean_encrypt(0, bck, &f));
    CHECK(tfhe_boolean_and(bsk, t, f, &g));
    CHECK(tfhe_boolean_decrypt(g, bck, &v));
    assert(v == 0);
    CHECK(tfhe_destroy(g));
    CHECK(tfhe_boolean_xor(bsk, t, f, &g));
    CHECK(tfhe_boolean_decrypt(g, bck, &v));
    assert(v == 1);
    CHECK(tfhe_boolean_mux(bsk, t, f, t, &m));
    CHECK(tfhe_boolean_decrypt(m, bck, &v));
    assert(v == 0);
    CHECK(tfhe_destroy(g));
    CHECK(tfhe_destroy(m));
    CHECK(tfhe_destroy(t));
    CHECK(tfhe_destroy(f));
  }

  /* shortint scheme through the ABI --------------------------------------- */
  {
    tfhe_handle sck = 0, ssk = 0, p = 0, q = 0, r = 0;
    uint64_t v = 0;
    CHECK(tfhe_shortint_gen_keys("TEST_PARAMS_SHORTINT", 9, &sck, &ssk));
    CHECK(tfhe_shortint_encrypt(2, sck, &p));
    CHECK(tfhe_shortint_encrypt(3, sck, &q));
    CHECK(tfhe_shortint_add(ssk, p, q, &r));
    CHECK(tfhe_shortint_decrypt(r, sck, &v));
    assert(v == (2 + 3) % 4);
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_shortint_mul(ssk, p, q, &r));
    CHECK(tfhe_shortint_decrypt(r, sck, &v));
    assert(v == (2 * 3) % 4);
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_shortint_scalar_add(ssk, p, 1, &r));
    CHECK(tfhe_shortint_decrypt(r, sck, &v));
    assert(v == 3);
    CHECK(tfhe_destroy(r));
    CHECK(tfhe_destroy(p));
    CHECK(tfhe_destroy(q));
  }

  CHECK(tfhe_tpu_shutdown());

  printf("PASS\n");
  return 0;
}
