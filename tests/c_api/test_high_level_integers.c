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
  CHECK(tfhe_tpu_shutdown());

  printf("PASS\n");
  return 0;
}
