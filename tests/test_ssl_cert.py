"""DER/X.509 reader: build/parse round-trips + Spark stage
(reference ssl_certificate.py decode surface)."""

from __future__ import annotations

import hashlib

from crawl4ai_spark.functions.ssl_cert import (
    build_certificate,
    generate_certs,
    parse_certificate,
    ssl_cert_stage,
)


def _cert(**kw):
    base = dict(
        subject={"CN": "www.example.com", "O": "Example Org"},
        issuer={"CN": "Example CA", "C": "US"},
        serial=424242,
        not_before="2024-01-01 00:00:00",
        not_after="2026-01-01 00:00:00",
    )
    base.update(kw)
    return build_certificate(**base)


def test_round_trip():
    der = _cert()
    p = parse_certificate(der)
    assert p["subject"] == {"CN": "www.example.com", "O": "Example Org"}
    assert p["issuer"] == {"CN": "Example CA", "C": "US"}
    assert p["serial"] == 424242
    assert p["not_before"] == "2024-01-01 00:00:00"
    assert p["not_after"] == "2026-01-01 00:00:00"
    assert p["fingerprint_sha256"] == hashlib.sha256(der).hexdigest()


def test_long_form_lengths():
    # long subject O forces >127-byte TLVs through the long-form path
    der = _cert(subject={"CN": "x.example.com", "O": "O" * 300})
    p = parse_certificate(der)
    assert p["subject"]["O"] == "O" * 300


def test_malformed():
    for bad in [None, b"", b"\x30\x03\x02\x01", b"garbage bytes"]:
        assert parse_certificate(bad) is None


def test_real_der_if_available():
    """If the host python has a bundled CA cert, parse one for free."""
    import ssl

    pem = ssl.get_default_verify_paths().cafile
    if not pem:
        return
    try:
        with open(pem) as f:
            body = f.read().split("-----BEGIN CERTIFICATE-----")[1]
        import base64

        der = base64.b64decode(body.split("-----END CERTIFICATE-----")[0])
    except Exception:
        return
    p = parse_certificate(der)
    assert p is not None and p["issuer"] and p["not_after"]


def test_ssl_stage_spark(spark, sf_dir):
    out = ssl_cert_stage(generate_certs(spark, sf_dir)).cache()
    row = out.filter("doc_id = 5").first()
    assert row["subject_cn"] == "h5.example.com"
    assert row["issuer_cn"] == "Example CA 2"
    assert row["serial"] == 1005
    assert row["not_after"].startswith("2026-06")
    assert out.filter("fingerprint IS NULL").count() == 0
    out.unpersist()
