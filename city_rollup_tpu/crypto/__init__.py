"""Out-of-circuit cryptography (city_crypto equivalent, SURVEY.md §2.1 row 4):
BTC hash primitives, QHashOut felt digests + felt248/252 packing, secp256k1
curve + ECDSA + wallet."""

from .hashes import (Hash160, Hash256, hash160, hash256, ripemd160, sha256,
                     sha256d)
from .qhashout import (QHashOut, felt248_from_hash256, felt248_to_hash256,
                       felt252_from_hash256, felt252_to_hash256)
from .secp256k1 import (ECDSAPublicKey, ECDSASignature, Secp256K1Wallet,
                        ecdsa_sign, ecdsa_verify)
