"""SSL certificate parsing (SURVEY.md X14).

Reference: SSLCertificate (/root/reference/crawl4ai/ssl_certificate.py,
203 LoC): fetches a host's certificate and exposes issuer/subject RDNs,
validity window, serial, fingerprint and PEM/DER/JSON export. The
network fetch is an external effect; the decoding layer is rebuilt here
as a minimal from-scratch DER/ASN.1 reader (stdlib only): X.509
Certificate -> TBSCertificate -> serial, issuer/subject RDN maps
(CN/O/OU/C via OID), UTCTime/GeneralizedTime validity, plus the sha256
fingerprint of the DER bytes. A matching DER builder synthesizes valid
test certificates so the parser is pinned by round-trips (the build_pdf
pattern).

Spark surface: ``ssl_cert_stage`` — Arrow-batched mapInPandas over a
binary DER column.
"""

from __future__ import annotations

import datetime as _dt
import hashlib

_OID_NAMES = {
    (2, 5, 4, 3): "CN", (2, 5, 4, 10): "O", (2, 5, 4, 11): "OU",
    (2, 5, 4, 6): "C", (2, 5, 4, 7): "L", (2, 5, 4, 8): "ST",
}


# -- DER primitives ----------------------------------------------------------


def _read_tlv(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """-> (tag, value, next_pos)."""
    tag = data[pos]
    ln = data[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(data[pos : pos + n], "big")
        pos += n
    return tag, data[pos : pos + ln], pos + ln


def _children(value: bytes):
    pos = 0
    while pos < len(value):
        tag, v, pos = _read_tlv(value, pos)
        yield tag, v


def _decode_oid(v: bytes) -> tuple:
    if not v:
        return ()
    out = [v[0] // 40, v[0] % 40]
    acc = 0
    for b in v[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(acc)
            acc = 0
    return tuple(out)


def _decode_time(tag: int, v: bytes) -> str:
    s = v.decode("ascii")
    if tag == 0x17:  # UTCTime YYMMDDHHMMSSZ
        yy = int(s[:2])
        year = 2000 + yy if yy < 50 else 1900 + yy
        s = f"{year}{s[2:]}"
    dt = _dt.datetime.strptime(s.rstrip("Z"), "%Y%m%d%H%M%S")
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def _decode_name(v: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for _tag, rdn_set in _children(v):          # SET
        for _t2, atv in _children(rdn_set):     # SEQ{OID, value}
            parts = list(_children(atv))
            if len(parts) == 2:
                oid = _decode_oid(parts[0][1])
                out[_OID_NAMES.get(oid, ".".join(map(str, oid)))] = (
                    parts[1][1].decode("utf-8", "replace")
                )
    return out


def parse_certificate(der: bytes | None) -> dict | None:
    """DER X.509 -> {subject, issuer, serial, not_before, not_after,
    fingerprint_sha256}; None for undecodable input."""
    if not der:
        return None
    try:
        _tag, cert, _ = _read_tlv(der, 0)
        tbs_tag, tbs, _pos = _read_tlv(cert, 0)
        fields = list(_children(tbs))
        i = 0
        if fields and fields[0][0] == 0xA0:  # [0] EXPLICIT version
            i = 1
        serial = int.from_bytes(fields[i][1], "big", signed=True)
        issuer = _decode_name(fields[i + 2][1])
        validity = list(_children(fields[i + 3][1]))
        subject = _decode_name(fields[i + 4][1])
        return {
            "subject": subject,
            "issuer": issuer,
            "serial": serial,
            "not_before": _decode_time(*validity[0]),
            "not_after": _decode_time(*validity[1]),
            "fingerprint_sha256": hashlib.sha256(der).hexdigest(),
        }
    except Exception:
        return None


# -- DER builder (synthetic test certificates) -------------------------------


def _tlv(tag: int, value: bytes) -> bytes:
    ln = len(value)
    if ln < 0x80:
        return bytes([tag, ln]) + value
    enc = ln.to_bytes((ln.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(enc)]) + enc + value


def _seq(*parts: bytes) -> bytes:
    return _tlv(0x30, b"".join(parts))


def _encode_oid(oid: tuple) -> bytes:
    body = bytes([oid[0] * 40 + oid[1]])
    for comp in oid[2:]:
        enc = [comp & 0x7F]
        comp >>= 7
        while comp:
            enc.append(0x80 | (comp & 0x7F))
            comp >>= 7
        body += bytes(reversed(enc))
    return _tlv(0x06, body)


def _name(attrs: dict[str, str]) -> bytes:
    rev = {v: k for k, v in _OID_NAMES.items()}
    rdns = b""
    for key, val in attrs.items():
        atv = _seq(_encode_oid(rev[key]), _tlv(0x0C, val.encode()))
        rdns += _tlv(0x31, atv)  # SET
    return _tlv(0x30, rdns)


def _utctime(iso: str) -> bytes:
    dt = _dt.datetime.strptime(iso, "%Y-%m-%d %H:%M:%S")
    return _tlv(0x17, dt.strftime("%y%m%d%H%M%S").encode() + b"Z")


def build_certificate(subject: dict[str, str], issuer: dict[str, str],
                      serial: int, not_before: str, not_after: str) -> bytes:
    """Minimal syntactically-valid DER certificate (unsigned stub
    signature) for parser round-trips."""
    sigalg = _seq(_encode_oid((1, 2, 840, 113549, 1, 1, 11)), _tlv(0x05, b""))
    n = serial.to_bytes(max((serial.bit_length() + 8) // 8, 1), "big", signed=True)
    spki = _seq(
        _seq(_encode_oid((1, 2, 840, 113549, 1, 1, 1)), _tlv(0x05, b"")),
        _tlv(0x03, b"\x00" + b"\x42" * 16),
    )
    tbs = _seq(
        _tlv(0xA0, _tlv(0x02, b"\x02")),  # version v3
        _tlv(0x02, n),
        sigalg,
        _name(issuer),
        _seq(_utctime(not_before), _utctime(not_after)),
        _name(subject),
        spki,
    )
    return _seq(tbs, sigalg, _tlv(0x03, b"\x00" + b"\x00" * 8))


def generate_certs(spark, sf_dir: str):
    """Deterministic cert table: one DER cert per doc, fields
    arithmetic in doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, source in zip(pdf["doc_id"], pdf["source"]):
                i = int(i)
                der = build_certificate(
                    subject={"CN": f"h{i % 32}.example.com", "O": source},
                    issuer={"CN": f"Example CA {i % 3}", "C": "US"},
                    serial=1000 + i,
                    not_before="2024-01-01 00:00:00",
                    not_after=f"2026-0{1 + i % 9}-01 00:00:00",
                )
                rows.append((i, der))
            yield pd.DataFrame(rows, columns=["doc_id", "der"])

    return docs.mapInPandas(render, schema="doc_id bigint, der binary")


SSL_DDL = (
    "subject_cn string, subject_o string, issuer_cn string, issuer_c string, "
    "serial bigint, not_before string, not_after string, fingerprint string"
)


def ssl_cert_stage(df, der_col: str = "der", id_cols: tuple = ("doc_id",)):
    """Arrow-batched certificate decode; undecodable rows -> nulls."""
    id_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString()
        for f in df.schema.fields
        if f.name in id_cols
    )

    def process(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                ids = tuple(pdf[c].iloc[idx] for c in id_cols)
                blob = pdf[der_col].iloc[idx]
                p = parse_certificate(bytes(blob) if blob is not None else None)
                if p is None:
                    rows.append(ids + (None,) * 8)
                else:
                    rows.append(
                        ids
                        + (
                            p["subject"].get("CN"), p["subject"].get("O"),
                            p["issuer"].get("CN"), p["issuer"].get("C"),
                            p["serial"], p["not_before"], p["not_after"],
                            p["fingerprint_sha256"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[*id_cols, "subject_cn", "subject_o", "issuer_cn",
                         "issuer_c", "serial", "not_before", "not_after",
                         "fingerprint"],
            )

    return df.mapInPandas(process, schema=id_ddl + ", " + SSL_DDL)
