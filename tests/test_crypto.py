"""city_crypto-equivalent layer: BTC hashes, felt packing, secp256k1."""

import hashlib

from city_rollup_tpu.crypto import hashes, qhashout, secp256k1 as s


def test_sha256d_and_hash160():
    assert hashes.sha256(b"abc") == hashlib.sha256(b"abc").digest()
    assert hashes.sha256d(b"abc") == hashlib.sha256(
        hashlib.sha256(b"abc").digest()).digest()
    # known vector: hash160 of the generator's compressed pubkey
    pk = s.ECDSAPublicKey(s.GENERATOR).to_bytes_compressed()
    assert hashes.hash160(pk).hex() == (
        "751e76e8199196d454941c45d1b3a323f1433bd6")


def test_ripemd160_pure_matches_openssl():
    for msg in [b"", b"a", b"abc", b"message digest", bytes(range(200))]:
        assert hashes._ripemd160_pure(msg) == hashlib.new(
            "ripemd160", msg).digest()
    assert hashes._ripemd160_pure(b"abc").hex() == (
        "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")


def test_felt_packing_roundtrip():
    h = hashlib.sha256(b"felt").digest()
    f252 = qhashout.felt252_from_hash256(h)
    assert all(f < (1 << 63) for f in f252)
    back = qhashout.felt252_to_hash256(f252)
    # top bit of each 8-byte limb is cleared
    for i in range(4):
        masked = bytearray(h[8 * i:8 * i + 8])
        masked[7] &= 0x7F
        assert back[8 * i:8 * i + 8] == bytes(masked)

    f248 = qhashout.felt248_from_hash256(h)
    assert f248[3] < (1 << 56)
    back = qhashout.felt248_to_hash256(f248)
    assert back[:24] == h[:24] and back[24:31] == h[24:31]


def test_qhashout_hash_and_two_to_one():
    a = qhashout.QHashOut.hash_many([1, 2, 3])
    b = qhashout.QHashOut.hash_many([4, 5, 6])
    c = a.two_to_one(b)
    assert len(c.elements) == 4 and c != a
    assert qhashout.QHashOut.from_le_bytes(c.to_le_bytes()) == c


def test_secp256k1_known_vectors():
    # 2G, SEC2 test vector
    two_g = s.scalar_mul(2, s.GENERATOR)
    assert two_g.x == int(
        "C6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5",
        16)
    assert two_g.is_on_curve()
    # n·G = infinity
    assert s.scalar_mul(s.N, s.GENERATOR).infinity


def test_glv_matches_plain_mul():
    for k in [1, 2, 12345, s.N - 1,
              0x55555555555555555555555555555555]:
        assert s.glv_mul(k, s.GENERATOR) == s.scalar_mul(k, s.GENERATOR)


def test_ecdsa_sign_verify_roundtrip():
    wallet = s.Secp256K1Wallet()
    pk = wallet.add_random_key(b"user0")
    msg = int.from_bytes(hashlib.sha256(b"hello rollup").digest(), "big")
    sig = wallet.sign(pk, msg)
    assert s.ecdsa_verify(pk, msg, sig)
    assert not s.ecdsa_verify(pk, msg + 1, sig)
    pk2 = wallet.add_random_key(b"user1")
    assert not s.ecdsa_verify(pk2, msg, sig)
    # deterministic nonces → stable signature
    assert wallet.sign(pk, msg) == sig
    # compressed round-trip
    rt = s.ECDSAPublicKey.from_bytes_compressed(pk.to_bytes_compressed())
    assert rt.point == pk.point


def test_glv_decomposition_and_mul():
    """GLV endomorphism split (curve/glv.rs twin): k = k1 + k2*lambda with
    half-width halves, endo(P) == [lambda]P, and glv_mul == scalar_mul."""
    import random
    from city_rollup_tpu.crypto import secp256k1 as c
    rnd = random.Random(3)
    assert pow(c.GLV_BETA, 3, c.P) == 1 and c.GLV_BETA != 1
    assert pow(c.GLV_LAMBDA, 3, c.N) == 1 and c.GLV_LAMBDA != 1
    g = c.GENERATOR
    assert c.endo(g) == c.scalar_mul(c.GLV_LAMBDA, g)
    for _ in range(4):
        k = rnd.randrange(1, c.N)
        k1, k2 = c.glv_decompose(k)
        assert (k1 + k2 * c.GLV_LAMBDA - k) % c.N == 0
        assert abs(k1).bit_length() <= 129
        assert abs(k2).bit_length() <= 129
        assert c.glv_mul(k, g) == c.scalar_mul(k, g)
    assert c.glv_mul(0, g).infinity
