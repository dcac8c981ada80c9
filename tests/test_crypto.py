"""JOSE decrypt/encrypt oracles with the reference's golden fixtures
(JoseTest.java:22-104, usable verbatim per SURVEY §5). No Ray."""

import orjson
import pyarrow as pa
import pytest

from connect_smts_ray.transforms.crypto import (
    DecryptColumn,
    EncryptColumn,
    JoseConfig,
    JoseError,
)

JWK1 = (
    "eyJrdHkiOiJvY3QiLCJraWQiOiJIMmg1WHlIM0dPSHQ4Wm5vTndBOUFoay1FQlJ3cTQxTHo3U01p"
    "WDJDLVRJIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJkR2tQRU41YUhaQnFocDY5TmpVWGpjTUJST1R4"
    "amZ6Yl9hYldVeUo2ajBBIn0="
)
JWK2 = (
    "eyJrdHkiOiJvY3QiLCJraWQiOiJjbmVkYXRXNEg4SFA4VjFFSVQ3QjJsdHk0TXFsM3FKV3ZPUmk1"
    "MFZVdWZvIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJjYmtncEtVZ1c0RFRaS2RkQzAwcHJTSjl5UnZG"
    "SGc3OTFOa0V6R2RLTFlZIn0="
)
# JoseTest.java:30 — decrypts to {"foo":"bar"} under JWK1
CT1 = (
    '{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiSDJoNVh5SDNHT0'
    'h0OFpub053QTlBaGstRUJSd3E0MUx6N1NNaVgyQy1USSJ9","iv":"QsJ90lUJoBW05RN3",'
    '"ciphertext":"4YQYK0F4LoFpP6-P0g","tag":"88OtNkM7CVsOX52rLxgl2Q"}'
)
# JoseTest.java:48 — decrypts to {"bar":"baz"} under JWK2
CT2 = (
    '{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiY25lZGF0VzRIOE'
    'hQOFYxRUlUN0IybHR5NE1xbDNxSld2T1JpNTBWVXVmbyJ9","iv":"rhGttLfHmwq7beFr",'
    '"ciphertext":"L4OQkrC1zagy2DLDtw","tag":"9T29uivX5K_O_503UKmicA"}'
)


def batch_of(payloads):
    return pa.table({"value_cipher": pa.array(
        [p.encode() if isinstance(p, str) else p for p in payloads],
        type=pa.binary(),
    )})


def test_decrypt_golden_ciphertext():
    # JoseTest.java:22-38
    d = DecryptColumn(JoseConfig(keys=JWK1))
    out = d(batch_of([CT1]))
    assert out.column("value_cipher").to_pylist() == [b'{"foo":"bar"}']


def test_decrypt_multi_key_ring():
    # JoseTest.java:40-56 — second key in the ring decrypts
    d = DecryptColumn(JoseConfig(keys=f"{JWK1},{JWK2}"))
    out = d(batch_of([CT2]))
    assert out.column("value_cipher").to_pylist() == [b'{"bar":"baz"}']


def test_wrong_key_raises_by_default():
    # JoseTest.java:58-70
    d = DecryptColumn(JoseConfig(keys=JWK1))
    with pytest.raises(JoseError):
        d(batch_of([CT2]))


def test_skip_on_error_keeps_original():
    # JoseTest.java:72-87
    d = DecryptColumn(JoseConfig(keys=JWK1, skip_on_error=True))
    out = d(batch_of([CT2]))
    assert out.column("value_cipher").to_pylist() == [CT2.encode()]


def test_skip_on_error_non_jwe_payload():
    # JoseTest.java:89-104
    d = DecryptColumn(JoseConfig(keys=JWK1, skip_on_error=True))
    out = d(batch_of(["Not a JWE format at all."]))
    assert out.column("value_cipher").to_pylist() == [b"Not a JWE format at all."]


def test_empty_key_ring_raises():
    # smt/Jose.java:77-79
    with pytest.raises(JoseError):
        DecryptColumn(JoseConfig(keys=""))


def test_invalid_key_raises():
    with pytest.raises(JoseError):
        DecryptColumn(JoseConfig(keys="!!!notbase64!!!"))


def test_encrypt_decrypt_roundtrip():
    cfg = JoseConfig(keys=JWK1)
    enc = EncryptColumn(cfg, deterministic=True)
    dec = DecryptColumn(cfg)
    plaintexts = [b'{"foo":"bar"}', b"hello world", None, b""]
    out = dec(enc(batch_of([p for p in plaintexts])))
    assert out.column("value_cipher").to_pylist() == plaintexts


def test_encrypt_is_flattened_jwe_with_kid():
    enc = EncryptColumn(JoseConfig(keys=JWK1), deterministic=True)
    out = enc(batch_of([b"x"]))
    jwe = orjson.loads(out.column("value_cipher").to_pylist()[0])
    assert set(jwe) == {"protected", "iv", "ciphertext", "tag"}


def test_encrypt_deterministic_mode_stable():
    enc1 = EncryptColumn(JoseConfig(keys=JWK1), deterministic=True)
    enc2 = EncryptColumn(JoseConfig(keys=JWK1), deterministic=True)
    a = enc1(batch_of([b"abc"])).column("value_cipher").to_pylist()
    b = enc2(batch_of([b"abc"])).column("value_cipher").to_pylist()
    assert a == b


def test_roundtrip_with_second_ring_key_decrypting():
    # encrypt under JWK2, decrypt with ring [JWK1, JWK2] — brute-force works
    enc = EncryptColumn(JoseConfig(keys=JWK2), deterministic=True)
    dec = DecryptColumn(JoseConfig(keys=f"{JWK1},{JWK2}"))
    out = dec(enc(batch_of([b"payload"])))
    assert out.column("value_cipher").to_pylist() == [b"payload"]
