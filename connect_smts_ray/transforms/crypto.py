"""JOSE field encryption — the Jose SMT (decrypt) + its Encrypt inverse.

Behavioral parity with /root/reference ``smt/Jose.java:43-193``:

- Payload = flattened JWE JSON ``{"protected","iv","ciphertext","tag"}``;
  compact form is ``protected..iv.ciphertext.tag`` (empty recipients
  segment, :122-129).
- Algorithms restricted to key management ``dir`` + content encryption
  ``A256GCM`` (:116-119): direct AES-256-GCM with a symmetric ``oct`` JWK.
- Key ring: comma-separated base64(JWK JSON) (:64-71); decryption
  brute-forces the ring in order, ignoring the JWE header ``kid`` (:111-149).
- Errors: undecodable payload or no-key-decrypts →
  ``skip_on_error ? keep original : raise`` (:130-158).

RFC 7516: the AES-GCM AAD is the ASCII bytes of the b64url protected header,
which is what makes tags interoperate with jose4j (verified against the
reference's golden ciphertexts in JoseTest.java:25-55).

Ray Data mapping: callable classes for
``ds.map_batches(DecryptColumn(cfg), batch_format="pyarrow", concurrency=N)``.
The JWK ring is decoded once per actor in ``__init__`` and keys are also
cached by ``kid`` (the north star's per-key envelope cache) so a matching
``kid`` header skips the ring brute-force.
"""

from __future__ import annotations

import base64
import binascii
import json
from dataclasses import dataclass
from typing import Optional

import orjson
import pyarrow as pa

from cryptography.hazmat.primitives.ciphers.aead import AESGCM


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _b64url_encode(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode().rstrip("=")


class JoseError(ValueError):
    pass


@dataclass(frozen=True)
class JoseConfig:
    """``keys`` = comma-separated base64(JWK JSON) (smt/Jose.java:64-71)."""

    keys: str = ""
    skip_on_error: bool = False
    columns: tuple = ("value_cipher",)

    def parse_ring(self) -> list:
        ring = []
        for b64 in self.keys.split(","):
            if not b64:
                continue
            try:
                jwk = json.loads(base64.b64decode(b64))
            except (ValueError, binascii.Error) as e:
                raise JoseError(
                    "The provided encryption key is not valid. It should be a "
                    "base64-encoded JWK key."
                ) from e
            if jwk.get("kty") != "oct" or "k" not in jwk:
                raise JoseError("Only symmetric 'oct' JWKs are supported.")
            ring.append((jwk.get("kid"), _b64url_decode(jwk["k"])))
        if not ring:
            raise JoseError("No encryption keys have been configured.")
        return ring


def _protected_header(kid: Optional[str]) -> str:
    header = {"enc": "A256GCM", "alg": "dir"}
    if kid is not None:
        header["kid"] = kid
    return _b64url_encode(orjson.dumps(header))


class DecryptColumn:
    """Actor-pool batch transform decrypting binary columns in place."""

    def __init__(self, config: JoseConfig):
        self.config = config
        self.ring = [
            (kid, AESGCM(key)) for kid, key in config.parse_ring()
        ]
        self.by_kid = {kid: c for kid, c in self.ring if kid is not None}
        # protected-header parse cache: a stream encrypted under one key
        # ring repeats the same few header strings millions of times
        self._header_cache: dict = {}

    def _cipher_for_protected(self, protected: str):
        """(cipher-or-None, status) for a protected header string, cached.
        status: "ok" | "unsupported" (alg/enc mismatch) | "bad_header"
        (not b64url/JSON — the reference PARSES the header before
        anything else, Jose.java:116-119, so an undecodable header is an
        error, never a brute-force-the-ring fallback: accepting such a
        payload here would decrypt records the reference rejects)."""
        hit = self._header_cache.get(protected)
        if hit is not None:
            return hit
        try:
            header = orjson.loads(_b64url_decode(protected))
            if not isinstance(header, dict):
                raise ValueError("protected header is not a JSON object")
        except Exception:
            res = (None, "bad_header")
        else:
            if (header.get("alg") not in (None, "dir")
                    or header.get("enc") not in (None, "A256GCM")):
                res = (None, "unsupported")
            else:
                res = (self.by_kid.get(header.get("kid")), "ok")
        self._header_cache[protected] = res
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        skip = self.config.skip_on_error
        for col in self.config.columns:
            if col not in batch.column_names:
                continue
            values = batch.column(col).to_pylist()
            out = []
            for v in values:
                if v is None:
                    out.append(None)
                    continue
                if isinstance(v, str):
                    v = v.encode()
                out.append(self._decrypt_row(v, skip))
            idx = batch.column_names.index(col)
            batch = batch.set_column(
                idx, pa.field(col, pa.binary()), pa.array(out, type=pa.binary())
            )
        return batch

    def _decrypt_row(self, raw: bytes, skip_on_error: bool) -> bytes:
        """Hot-path variant of ``_decrypt_one`` with the header cache."""
        try:
            flattened = orjson.loads(raw)
            protected = flattened["protected"]
            aad = protected.encode("ascii")
            iv = _b64url_decode(flattened["iv"])
            data = (
                _b64url_decode(flattened["ciphertext"])
                + _b64url_decode(flattened["tag"])
            )
        except Exception as e:
            if skip_on_error:
                return raw
            raise JoseError(f"Flattened JWE could not be decoded: {e}") from e

        cipher, status = self._cipher_for_protected(protected)
        if status != "ok":
            if skip_on_error:
                return raw
            raise JoseError(
                "Unsupported JWE algorithms" if status == "unsupported"
                else "JWE protected header could not be decoded")
        if cipher is not None:
            try:
                return cipher.decrypt(iv, data, aad)
            except Exception:
                pass
        for _, c in self.ring:
            try:
                return c.decrypt(iv, data, aad)
            except Exception:
                continue
        if skip_on_error:
            return raw
        raise JoseError("Message could not be decrypted with any encryption key")


class EncryptColumn:
    """Inverse stage (engine addition; needed to synthesize fixtures and for
    the round-trip oracle — SURVEY §2.4 "Field-level Encrypt").

    Deterministic mode derives the 96-bit IV from
    sha256(key ‖ plaintext ‖ row-index) — ONLY for reproducible test
    fixtures; production use generates random IVs.
    """

    def __init__(self, config: JoseConfig, deterministic: bool = False):
        import hashlib
        import os

        self.config = config
        self.ring = config.parse_ring()
        self.kid, self.key = self.ring[0]
        self.cipher = AESGCM(self.key)
        self.deterministic = deterministic
        self._hashlib = hashlib
        self._os = os

    def _iv(self, plaintext: bytes, i: int) -> bytes:
        if self.deterministic:
            return self._hashlib.sha256(
                self.key + plaintext + i.to_bytes(8, "little")
            ).digest()[:12]
        return self._os.urandom(12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Per-actor constants hoisted out of the row loop: the protected
        # header (and its AAD bytes) depend only on the key.
        protected = _protected_header(self.kid)
        aad = protected.encode("ascii")
        prefix = '{"protected":"' + protected + '","iv":"'
        encrypt = self.cipher.encrypt
        b64 = _b64url_encode
        for col in self.config.columns:
            if col not in batch.column_names:
                continue
            values = batch.column(col).to_pylist()
            out = []
            for i, v in enumerate(values):
                if v is None:
                    out.append(None)
                    continue
                if isinstance(v, str):
                    v = v.encode()
                iv = self._iv(v, i)
                ct_tag = encrypt(iv, v, aad)
                out.append(
                    (
                        prefix + b64(iv) + '","ciphertext":"'
                        + b64(ct_tag[:-16]) + '","tag":"'
                        + b64(ct_tag[-16:]) + '"}'
                    ).encode()
                )
            idx = batch.column_names.index(col)
            batch = batch.set_column(
                idx, pa.field(col, pa.binary()), pa.array(out, type=pa.binary())
            )
        return batch
