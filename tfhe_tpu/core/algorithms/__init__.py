from .bootstrap import (blind_rotate, blind_rotate_only, cmux,
                        external_product_accumulate, external_product_num_primes,
                        modulus_switch, programmable_bootstrap, sample_extract)
from .encryption import (bootstrap_key_to_ntt, decrypt_glwe, decrypt_lwe,
                         encrypt_constant_ggsw, encrypt_glwe, encrypt_lwe,
                         generate_bootstrap_key, generate_glwe_secret_key,
                         generate_keyswitch_key, generate_lwe_secret_key,
                         generate_packing_keyswitch_key, trivial_glwe,
                         trivial_lwe)
from .gsw import cmux_lwe, encrypt_constant_gsw, gsw_external_product
from .keyswitch import (keyswitch_lwe, packing_keyswitch_lwe_list_to_glwe,
                        packing_keyswitch_lwe_to_glwe)
from .linear import (glwe_add, glwe_add_plaintext_poly, glwe_sub, lwe_add,
                     lwe_add_plaintext, lwe_mul_cleartext, lwe_neg, lwe_sub,
                     lwe_sub_plaintext)
from .pbs128 import (Glwe128, KeyswitchKey128, Lwe128, NttBootstrapKey128,
                     blind_rotate128, bootstrap_key128_to_ntt,
                     decrypt_glwe128, decrypt_lwe128, encrypt_glwe128,
                     encrypt_lwe128, generate_bootstrap_key128,
                     generate_keyswitch_key128, keyswitch128,
                     programmable_bootstrap128, sample_extract128,
                     trivial_glwe128)
