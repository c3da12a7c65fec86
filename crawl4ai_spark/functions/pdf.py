"""PDF processing (SURVEY.md X14 tier / reference processors/pdf).

Reference: NaivePDFProcessorStrategy
(/root/reference/crawl4ai/processors/pdf/processor.py:57-438): per-page
raw text via PyPDF2 visitor, markdown/html cleanup, /URI link harvest,
metadata (title/author/producer/pages/encrypted) — PDFPage /
PDFMetadata / PDFProcessResult model at :25-50.

PyPDF2 isn't in this environment, so the parser here is a from-scratch
minimal PDF reader over the raw bytes: object scan (`N 0 obj ...
endobj`), /Pages /Kids ordering, content streams (literal or
FlateDecode via stdlib zlib), BT/ET text runs from Tj and TJ
operators with PDF string escapes, /URI link annotations and the
Info dictionary. It handles the structurally-simple PDFs a training
pipeline normally bulk-ingests; exotic features (encryption beyond
flagging, CID fonts, object streams) are out of scope and surface as
empty text, never a crash. Markdown/html page rendering approximates
the reference's clean_pdf_text heuristics with plain paragraph
wrapping (documented divergence).

Spark surface: ``pdf_process_stage`` — one Arrow-batched mapInPandas
exploding (doc rows) -> (one row per page) with metadata carried.
"""

from __future__ import annotations

import html as _html
import re
import zlib

_OBJ_RX = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RX = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TJ_RX = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*Tj")
# NB: the char class must EXCLUDE backslash — [^\]] also matches '\\',
# making (?:\\.|[^\]])* ambiguous, and an unterminated TJ array in a
# corrupt stream then backtracks exponentially (hangs an executor core)
_TJA_RX = re.compile(rb"\[((?:\\.|[^\\\]])*)\]\s*TJ")
# one combined scan so Tj and TJ text interleave in DOCUMENT order —
# separate passes relocated all TJ-array text after all Tj text
_TEXT_OP_RX = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj|\[((?:\\.|[^\\\]])*)\]\s*TJ"
)
_STR_RX = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_URI_RX = re.compile(rb"/URI\s*\(((?:\\.|[^\\()])*)\)")
_KIDS_RX = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RX = re.compile(rb"(\d+)\s+0\s+R")
_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


def _dict_str(body: bytes, key: bytes) -> str | None:
    m = re.search(re.escape(key) + rb"\s*\(((?:\\.|[^\\()])*)\)", body)
    return _unescape(m.group(1)) if m else None


def _page_text(content: bytes) -> str:
    parts: list[str] = []
    for m in _TEXT_OP_RX.finditer(content):
        if m.group(1) is not None:  # (...) Tj
            parts.append(_unescape(m.group(1)))
        else:  # [...] TJ — join the array's string elements
            parts.append(
                "".join(
                    _unescape(s.group(1))
                    for s in _STR_RX.finditer(m.group(2))
                )
            )
    return "\n".join(p for p in parts if p)


def parse_pdf(data: bytes | None) -> dict:
    """-> {metadata: {...}, pages: [{page_number, raw_text, markdown,
    html, links}]} mirroring PDFProcessResult (processor.py:25-50)."""
    meta = {
        "title": None, "author": None, "producer": None,
        "n_pages": 0, "encrypted": False,
        "file_size": len(data) if data else 0,
    }
    if not data or not data.startswith(b"%PDF"):
        return {"metadata": meta, "pages": []}
    meta["encrypted"] = b"/Encrypt" in data

    objs: dict[int, bytes] = {}
    for m in _OBJ_RX.finditer(data):
        objs[int(m.group(1))] = m.group(2)

    # page order: /Pages object's /Kids list; fallback = object order
    page_ids = []
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body:
            kids = _KIDS_RX.search(body)
            if kids:
                page_ids = [int(r.group(1)) for r in _REF_RX.finditer(kids.group(1))]
            break
    if not page_ids:
        page_ids = [
            oid for oid, body in objs.items()
            if b"/Type" in body and re.search(rb"/Type\s*/Page\b", body)
        ]

    info_body = None
    info_ref = re.search(rb"/Info\s+(\d+)\s+0\s+R", data)
    if info_ref:
        info_body = objs.get(int(info_ref.group(1)))
    if info_body is None:
        info_body = next(
            (b for b in objs.values() if b"/Title" in b and b"/Type" not in b),
            None,
        )
    if info_body is not None:
        meta["title"] = _dict_str(info_body, b"/Title")
        meta["author"] = _dict_str(info_body, b"/Author")
        meta["producer"] = _dict_str(info_body, b"/Producer")

    pages = []
    for num, oid in enumerate(page_ids, start=1):
        body = objs.get(oid, b"")
        # /Contents as a single indirect ref OR the equally common
        # array form `[N 0 R ...]` (multi-element streams concatenate)
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
        if cm:
            content_refs = [int(cm.group(1))]
        else:
            ca = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
            content_refs = (
                [int(r.group(1)) for r in _REF_RX.finditer(ca.group(1))]
                if ca
                else []
            )
        texts = []
        for ref in content_refs:
            cbody = objs.get(ref)
            if cbody is None:
                continue
            sm = _STREAM_RX.search(cbody)
            if sm:
                stream = sm.group(1)
                if b"/FlateDecode" in cbody:
                    # decompressobj stops at the zlib stream end, so the
                    # newline before `endstream` (or any trailing bytes)
                    # can't corrupt the payload — rstrip would eat 0x0a
                    # bytes that legitimately end the compressed data
                    try:
                        stream = zlib.decompressobj().decompress(stream)
                    except zlib.error:
                        stream = b""
                t = _page_text(stream)
                if t:
                    texts.append(t)
        raw_text = "\n".join(texts)
        links = []
        for am in _REF_RX.finditer(
            (re.search(rb"/Annots\s*\[([^\]]*)\]", body) or _EMPTY).group(1)
        ):
            links.extend(
                _unescape(u.group(1))
                for u in _URI_RX.finditer(objs.get(int(am.group(1)), b""))
            )
        paras = [p for p in raw_text.split("\n") if p.strip()]
        markdown = "\n\n".join(paras)
        page_html = (
            f'<div class="pdf-page" id="page-{num}">'
            + "".join(f"<p>{_html.escape(p)}</p>" for p in paras)
            + "</div>"
        )
        pages.append(
            {
                "page_number": num, "raw_text": raw_text,
                "markdown": markdown, "html": page_html, "links": links,
            }
        )
    meta["n_pages"] = len(pages)
    return {"metadata": meta, "pages": pages}


class _EmptyMatch:
    @staticmethod
    def group(_i):
        return b""


_EMPTY = _EmptyMatch()


# ---------------------------------------------------------------------------
# deterministic synthetic PDFs (tests / catalog inputs)
# ---------------------------------------------------------------------------


def build_pdf(pages_text: list[str], *, title: str | None = None,
              author: str | None = None, producer: str = "crawl4ai-spark",
              compress: bool = False, links: list[str] | None = None) -> bytes:
    """Assemble a minimal valid single-body PDF with one content stream
    per page; optionally FlateDecode-compressed."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    out: list[bytes] = [b"%PDF-1.4\n"]
    n_pages = len(pages_text)
    kid_ids = [3 + 2 * i for i in range(n_pages)]
    info_id = 3 + 2 * n_pages
    annot_id = info_id + 1

    annot_ids = [annot_id + j for j in range(len(links or []))]

    out.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    kids = " ".join(f"{k} 0 R" for k in kid_ids)
    out.append(
        f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {n_pages} >> endobj\n".encode()
    )
    for i, text in enumerate(pages_text):
        pid, cid = kid_ids[i], kid_ids[i] + 1
        annots = (
            " /Annots [" + " ".join(f"{a} 0 R" for a in annot_ids) + "]"
            if links and i == 0
            else ""
        )
        out.append(
            f"{pid} 0 obj << /Type /Page /Parent 2 0 R "
            f"/Contents {cid} 0 R{annots} >> endobj\n".encode()
        )
        stream = f"BT /F1 12 Tf 72 720 Td ({esc(text)}) Tj ET".encode("latin-1")
        filt = ""
        if compress:
            stream = zlib.compress(stream)
            filt = " /Filter /FlateDecode"
        out.append(
            f"{cid} 0 obj << /Length {len(stream)}{filt} >> stream\n".encode()
            + stream
            + b"\nendstream endobj\n"
        )
    info = f"/Producer ({esc(producer)})"
    if title is not None:
        info = f"/Title ({esc(title)}) " + info
    if author is not None:
        info = f"/Author ({esc(author)}) " + info
    out.append(f"{info_id} 0 obj << {info} >> endobj\n".encode())
    if links:
        # one object id PER link — a shared id would make later bodies
        # overwrite earlier ones in any id-keyed reader (incl. parse_pdf)
        for aid, u in zip(annot_ids, links):
            out.append(
                f"{aid} 0 obj << /Subtype /Link /A << /Type /Action "
                f"/S /URI /URI ({esc(u)}) >> >> endobj\n".encode()
            )
    out.append(f"trailer << /Info {info_id} 0 R >>\n%%EOF".encode())
    return b"".join(out)


def generate_pdfs(spark, sf_dir: str):
    """Deterministic pdf table from documents: (doc_id, pdf binary);
    1 + doc_id%3 pages, each page holding a 10-word slice of the text;
    odd doc_ids are Flate-compressed; every 4th has a /URI link."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, text, source in zip(pdf["doc_id"], pdf["text"], pdf["source"]):
                i = int(i)
                words = text.split(" ")
                n_pages = 1 + i % 3
                pages = [
                    " ".join(words[k * 10 : k * 10 + 10]) for k in range(n_pages)
                ]
                blob = build_pdf(
                    pages,
                    title=f"Doc {i}",
                    author=source,
                    compress=bool(i % 2),
                    links=[f"https://ref{i % 9}.example.com/cite"]
                    if i % 4 == 0
                    else None,
                )
                rows.append((i, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "pdf"])

    return docs.mapInPandas(render, schema="doc_id bigint, pdf binary")


PDF_STAGE_DDL = (
    "title string, author string, producer string, n_pages int, "
    "encrypted boolean, page_number int, raw_text string, "
    "markdown string, page_html string, links array<string>"
)


def pdf_process_stage(df, content_col: str = "pdf", id_cols: tuple = ("doc_id",)):
    """Explode PDFs into one row per page with metadata carried — one
    Arrow-batched mapInPandas (the reference's process_batch loop
    :124-203, parallelized by partition instead of thread pool)."""
    id_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString()
        for f in df.schema.fields
        if f.name in id_cols
    )
    out_ddl = id_ddl + ", " + PDF_STAGE_DDL

    def process(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                ids = tuple(pdf[c].iloc[idx] for c in id_cols)
                blob = pdf[content_col].iloc[idx]
                res = parse_pdf(bytes(blob) if blob is not None else None)
                m = res["metadata"]
                if not res["pages"]:
                    # corrupt/encrypted/non-PDF blobs must stay
                    # observable (the reference returns a result per
                    # document): one metadata-only row, page_number 0
                    rows.append(
                        ids
                        + (
                            m["title"], m["author"], m["producer"],
                            m["n_pages"], m["encrypted"],
                            0, None, None, None, [],
                        )
                    )
                for pg in res["pages"]:
                    rows.append(
                        ids
                        + (
                            m["title"], m["author"], m["producer"],
                            m["n_pages"], m["encrypted"],
                            pg["page_number"], pg["raw_text"],
                            pg["markdown"], pg["html"], pg["links"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[*id_cols, "title", "author", "producer", "n_pages",
                         "encrypted", "page_number", "raw_text", "markdown",
                         "page_html", "links"],
            )

    return df.mapInPandas(process, schema=out_ddl)
