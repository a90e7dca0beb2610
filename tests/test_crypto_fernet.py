"""Fernet/PBKDF2 cookie-blob crypto (reference
secure_cookie_manager.py rendered faithfully — round-4 'missing #3')."""

from __future__ import annotations

import hashlib
import hmac as hmaclib
import json
import struct

from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.crypto import (
    BASE_PASSPHRASE,
    PBKDF2_ITERATIONS,
    derive_fernet_key,
    fernet_decrypt,
    fernet_encrypt,
)

SALT = b"0123456789abcdef"  # the reference's 16-byte os.urandom salt shape
KEY = derive_fernet_key(BASE_PASSPHRASE, SALT)
TS = 1_755_000_000
IV = b"\x11" * 16


def test_pbkdf2_matches_public_vector():
    """The KDF is the textbook PBKDF2-HMAC-SHA256 (public test vector:
    password/salt/c=1) with the reference's 100k-iteration production
    setting on top."""
    one = hashlib.pbkdf2_hmac("sha256", b"password", b"salt", 1, dklen=32)
    assert one.hex().startswith("120fb6cffcf8b32c")
    assert derive_fernet_key(b"password", b"salt", 1) == one
    assert PBKDF2_ITERATIONS == 100_000
    assert len(KEY) == 32


def _tokens(spark, payloads, iv=IV):
    df = spark.createDataFrame([(p,) for p in payloads], "data binary")
    return df.select(
        "data", fernet_encrypt(F.col("data"), KEY, TS, iv=iv).alias("token")
    )


def test_token_layout_and_mac(spark):
    cookie = json.dumps({"JSESSIONID": "abc123", "_expiration_time": TS + 3600})
    t = _tokens(spark, [cookie.encode()]).first()["token"]
    t = bytes(t)
    assert t[0] == 0x80  # Fernet version byte
    assert struct.unpack(">Q", t[1:9])[0] == TS
    assert t[9:25] == IV  # CBC IV rides in the clear, Fernet layout
    # the trailing 32 bytes are HMAC-SHA256(first-half key, header)
    want = hmaclib.new(KEY[:16], t[:-32], hashlib.sha256).digest()
    assert t[-32:] == want
    # ciphertext length: PKCS7 pads to the next 16-byte boundary
    ct = t[25:-32]
    assert len(ct) % 16 == 0 and len(ct) >= len(cookie)


def test_roundtrip_and_determinism(spark):
    payloads = [b"short", b"x" * 16, json.dumps({"k": "v"}).encode(), b""]
    df = _tokens(spark, payloads)
    out = df.select(
        "data",
        fernet_decrypt(F.col("token"), KEY, now=TS + 10, ttl=3600).alias(
            "plain"
        ),
    ).collect()
    for r in out:
        assert bytes(r["plain"]) == bytes(r["data"])
    # fixed IV + fixed ts -> bit-identical tokens across runs
    a = [bytes(r["token"]) for r in df.collect()]
    b = [bytes(r["token"]) for r in _tokens(spark, payloads).collect()]
    assert a == b


def test_tampered_token_rejected(spark):
    t = bytearray(bytes(_tokens(spark, [b"secret-cookie"]).first()["token"]))
    t[30] ^= 0x01  # flip one ciphertext bit
    df = spark.createDataFrame([(bytes(t),)], "token binary")
    row = df.select(
        fernet_decrypt(F.col("token"), KEY, now=TS, ttl=None).alias("p")
    ).first()
    assert row["p"] is None  # MAC fails closed, no partial plaintext


def test_ttl_expiry_rejected(spark):
    tok = _tokens(spark, [b"c"]).select("token")
    fresh = tok.select(
        fernet_decrypt(F.col("token"), KEY, now=TS + 100, ttl=3600).alias("p")
    ).first()["p"]
    stale = tok.select(
        fernet_decrypt(F.col("token"), KEY, now=TS + 4000, ttl=3600).alias("p")
    ).first()["p"]
    assert fresh is not None and stale is None


def test_wrong_key_rejected(spark):
    other = derive_fernet_key(BASE_PASSPHRASE, b"another-salt-16b")
    tok = _tokens(spark, [b"c"]).select("token")
    row = tok.select(
        fernet_decrypt(F.col("token"), other, now=TS, ttl=None).alias("p")
    ).first()
    assert row["p"] is None


def test_roundtrip_with_random_iv(spark):
    """Round-10 regression: spec-random IVs (no fixed iv) must still
    produce SELF-CONSISTENT tokens — the old concat(head, mac(head))
    evaluated the nondeterministic head twice (projection vs Arrow-UDF
    input, no CSE across the boundary), drawing two different IVs so
    the MAC never verified its own token."""
    from pyspark.sql import functions as F

    from atlassian_confluence_data_pipeline_spark.functions.crypto import (
        BASE_PASSPHRASE,
        derive_fernet_key,
        fernet_decrypt,
        fernet_encrypt,
    )

    key = derive_fernet_key(BASE_PASSPHRASE, b"random-iv-regression")
    ts = 1_700_000_000
    df = spark.createDataFrame(
        [(i, f"payload number {i}") for i in range(20)], "i int, text string"
    )
    tok = fernet_encrypt(F.encode(F.col("text"), "UTF-8"), key, ts)
    out = (
        df.select("text", tok.alias("tok"))
        .select(
            "text",
            "tok",
            F.decode(
                fernet_decrypt(F.col("tok"), key, now=ts + 1, ttl=3600),
                "UTF-8",
            ).alias("back"),
        )
        .collect()
    )
    assert all(r.back == r.text for r in out)
    # IVs really are random: distinct tokens for identical plaintexts
    dup = spark.createDataFrame([("same",), ("same",)], "text string")
    toks = dup.select(
        fernet_encrypt(F.encode(F.col("text"), "UTF-8"), key, ts).alias("t")
    ).collect()
    assert bytes(toks[0].t) != bytes(toks[1].t)
