/* tfhe_tpu C API.
 *
 * The analogue of the reference's cbindgen-generated tfhe.h
 * (tfhe/src/c_api/ + tfhe/build.rs): a flat C ABI over the high-level API,
 * opaque handles + destroy functions + int status returns (0 = success).
 * Implemented by libtfhe_tpu_capi.so (native/capi.cpp), which embeds
 * CPython and dispatches to the tfhe_tpu.capi flat surface; computation
 * runs on whatever accelerator JAX sees (TPU, else CPU).
 *
 * Usage mirrors tfhe/c_api_tests/test_high_level_integers.c:
 *   tfhe_tpu_init();
 *   tfhe_config_builder_custom("PARAM_MESSAGE_2_CARRY_2_KS_PBS", &cfg);
 *   tfhe_generate_keys(cfg, seed, &ck, &sk);
 *   tfhe_set_server_key(sk);
 *   tfhe_fheuint8_try_encrypt_with_client_key_u8(3, ck, &a);  ...
 */
#ifndef TFHE_TPU_H
#define TFHE_TPU_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int32_t tfhe_status; /* 0 = ok, non-zero = error */
typedef uint64_t tfhe_handle; /* opaque object handle; 0 is never valid */

/* runtime lifecycle ------------------------------------------------------ */
tfhe_status tfhe_tpu_init(void);
tfhe_status tfhe_tpu_shutdown(void);
/* static string describing the last Python-side error (never NULL) */
const char *tfhe_tpu_last_error(void);

/* config / keys ---------------------------------------------------------- */
tfhe_status tfhe_config_builder_default(tfhe_handle *out);
tfhe_status tfhe_config_builder_custom(const char *param_set_name,
                                       tfhe_handle *out);
tfhe_status tfhe_generate_keys(tfhe_handle config, uint64_t seed,
                               tfhe_handle *client_key,
                               tfhe_handle *server_key);
tfhe_status tfhe_set_server_key(tfhe_handle server_key);
tfhe_status tfhe_destroy(tfhe_handle h);

/* FheUint8 (the other widths follow the same pattern server-side) -------- */
tfhe_status tfhe_fheuint8_try_encrypt_with_client_key_u8(uint8_t value,
                                                         tfhe_handle client_key,
                                                         tfhe_handle *out);
tfhe_status tfhe_fheuint8_decrypt(tfhe_handle ct, tfhe_handle client_key,
                                  uint8_t *out);
tfhe_status tfhe_fheuint8_add(tfhe_handle lhs, tfhe_handle rhs,
                              tfhe_handle *out);
tfhe_status tfhe_fheuint8_sub(tfhe_handle lhs, tfhe_handle rhs,
                              tfhe_handle *out);
tfhe_status tfhe_fheuint8_mul(tfhe_handle lhs, tfhe_handle rhs,
                              tfhe_handle *out);
tfhe_status tfhe_fheuint8_bitand(tfhe_handle lhs, tfhe_handle rhs,
                                 tfhe_handle *out);
tfhe_status tfhe_fheuint8_bitor(tfhe_handle lhs, tfhe_handle rhs,
                                tfhe_handle *out);
tfhe_status tfhe_fheuint8_bitxor(tfhe_handle lhs, tfhe_handle rhs,
                                 tfhe_handle *out);
tfhe_status tfhe_fheuint8_eq(tfhe_handle lhs, tfhe_handle rhs,
                             tfhe_handle *out);
tfhe_status tfhe_fheuint8_le(tfhe_handle lhs, tfhe_handle rhs,
                             tfhe_handle *out);
tfhe_status tfhe_fheuint8_scalar_add(tfhe_handle lhs, uint8_t scalar,
                                     tfhe_handle *out);

/* serialization ---------------------------------------------------------- */
/* On success *out is malloc'd (caller frees with tfhe_buffer_destroy). */
tfhe_status tfhe_serialize(tfhe_handle h, uint8_t **out, size_t *len);
tfhe_status tfhe_deserialize_fheuint8(const uint8_t *data, size_t len,
                                      tfhe_handle *out);
void tfhe_buffer_destroy(uint8_t *buf);

#ifdef __cplusplus
}
#endif

#endif /* TFHE_TPU_H */
