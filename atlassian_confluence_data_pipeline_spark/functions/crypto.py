"""Faithful column-level rendering of the reference's cookie-blob
encryption (utilities/secure_cookie_manager.py:40-140):

- key derivation: PBKDF2-HMAC-SHA256, 16-byte salt, 100,000 iterations,
  32-byte key (:62-69) — stdlib ``hashlib.pbkdf2_hmac``, exact same
  parameters;
- cipher: the Fernet construction (:70) — AES-128-CBC/PKCS7 over the
  payload with the key's SECOND half, HMAC-SHA256 over
  ``version || timestamp || iv || ciphertext`` with the FIRST half,
  token = that header plus the 32-byte tag; verify-then-decrypt with an
  optional TTL, returning null on ANY failure (the reference returns
  None and logs, :126-136).

Engine split: AES rides Spark's JVM ``aes_encrypt``/``aes_decrypt``
(CBC mode prepends the IV, matching Fernet's layout), HMAC-SHA256 rides
an Arrow-batched pandas UDF (Spark has no builtin HMAC; stdlib ``hmac``
in the worker is the UDF-when-builtins-lack case, never row-at-a-time).
Token bytes are bit-compatible with RFC-style Fernet (version 0x80,
big-endian seconds), so blobs written here decrypt with the
``cryptography`` library and vice versa.

No DuckDB oracle: Fernet IVs are random by spec (tests inject a fixed
IV for determinism); semantics are carried by
tests/test_crypto_fernet.py (roundtrip, tamper, TTL, PBKDF2 vector).
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference constants (secure_cookie_manager.py:57-67)
PBKDF2_ITERATIONS = 100_000
BASE_PASSPHRASE = b"ConfluenceDataPipeline"
FERNET_VERSION = 0x80


def derive_fernet_key(
    passphrase: bytes, salt: bytes, iterations: int = PBKDF2_ITERATIONS
) -> bytes:
    """32-byte PBKDF2-HMAC-SHA256 key, the reference's exact KDF
    (algorithm/length/iterations from secure_cookie_manager.py:63-68).
    First 16 bytes sign (HMAC), last 16 encrypt (AES-128) — Fernet's
    key split."""
    return hashlib.pbkdf2_hmac("sha256", passphrase, salt, iterations, dklen=32)


def _hmac_sha256_udf(sign_key: bytes):
    @F.pandas_udf("binary")
    def _mac(data: pd.Series) -> pd.Series:
        import hmac as _hmac

        return data.map(
            lambda b: _hmac.new(sign_key, bytes(b), hashlib.sha256).digest()
            if b is not None
            else None
        )

    return _mac


def _sign_and_concat_udf(sign_key: bytes):
    """head -> head || HMAC-SHA256(head). The tag is appended INSIDE
    the UDF so the (possibly random-IV, i.e. NON-DETERMINISTIC) head
    expression is referenced exactly once in the plan — a separate
    ``concat(head, mac(head))`` evaluates ``head`` twice (projection +
    Arrow-UDF input are different plan nodes, no CSE across them),
    drawing two different IVs and producing tokens whose MAC never
    verifies (round-10 bug, caught by the fernet_roundtrip_docs
    oracle)."""

    @F.pandas_udf("binary")
    def _signed(head: pd.Series) -> pd.Series:
        import hmac as _hmac

        return head.map(
            lambda b: bytes(b)
            + _hmac.new(sign_key, bytes(b), hashlib.sha256).digest()
            if b is not None
            else None
        )

    return _signed


def fernet_encrypt(
    data: Column, key32: bytes, ts: int, iv: bytes | None = None
) -> Column:
    """Encrypt a BINARY column into Fernet tokens:
    ``0x80 || ts(8B BE) || iv(16) || AES-128-CBC(ct) || HMAC-SHA256(32)``.

    ``ts`` is the creation time in epoch seconds (a literal — batch jobs
    stamp one token generation per run, like the reference stamps one
    expiration per save). ``iv`` fixes the initialization vector for
    deterministic tests; omit it in production for spec-random IVs."""
    sign_key, enc_key = key32[:16], key32[16:]
    if iv is not None:
        ivct = F.aes_encrypt(
            data, F.lit(enc_key), F.lit("CBC"), F.lit("PKCS"), F.lit(iv)
        )
    else:
        ivct = F.aes_encrypt(data, F.lit(enc_key), F.lit("CBC"))
    head = F.concat(
        F.lit(bytes([FERNET_VERSION]) + struct.pack(">Q", ts)), ivct
    )
    return _sign_and_concat_udf(sign_key)(head)


def fernet_decrypt(
    token: Column, key32: bytes, now: int, ttl: int | None = None
) -> Column:
    """Verify-then-decrypt Fernet tokens: recompute the HMAC over
    everything but the tag, check version byte, check TTL against the
    embedded timestamp, AES-decrypt the iv||ct body. Any failure —
    wrong tag, wrong version, expired — yields NULL (the reference's
    tolerant None-on-failure, secure_cookie_manager.py:126-136)."""
    sign_key, enc_key = key32[:16], key32[16:]
    n = F.length(token)
    head = F.substr(token, F.lit(1), n - 32)
    tag = F.substr(token, n - 31, F.lit(32))
    mac_ok = _hmac_sha256_udf(sign_key)(head) == tag
    version_ok = F.substr(token, F.lit(1), F.lit(1)) == F.lit(
        bytes([FERNET_VERSION])
    )
    ts = F.conv(F.hex(F.substr(token, F.lit(2), F.lit(8))), 16, 10).cast(
        "bigint"
    )
    fresh = (
        F.lit(True) if ttl is None else (F.lit(now) - ts) <= F.lit(ttl)
    )
    ivct = F.substr(token, F.lit(10), n - 41)
    plain = F.aes_decrypt(ivct, F.lit(enc_key), F.lit("CBC"))
    return F.when(mac_ok & version_ok & fresh, plain)
