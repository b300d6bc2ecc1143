"""Dependency-free WARC (Web ARChive, ISO 28500) reader — the native
container of web-crawl corpora (Common-Crawl-style inputs): a crawl-scale
training-data pipeline's FIRST stage is "WARC bytes → document rows", so
the ingest path gets a real parser next to the media decoders.

Format: concatenated records, each ``WARC/1.x CRLF`` + header lines +
blank line + ``Content-Length`` bytes of body + two CRLFs. Real archives
(``.warc.gz``) gzip each record as its OWN gzip member so readers can
split without decompressing the whole file — handled via stdlib zlib
(multi-member decompression loop). The parser is a plain function usable
inside ``map_batches`` (payload column in, record rows out).
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"


def _split_gzip_members(payload: bytes):
    """Decompress concatenated gzip members (the .warc.gz layout), yielding
    one bytes blob per member."""
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(payload[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("empty gzip member in WARC payload")
        yield out
        pos += consumed


def parse_warc(payload: bytes) -> list[tuple[dict, bytes]]:
    """Parse WARC bytes (plain or per-record-gzipped) into a list of
    (headers, body) per record. Header names are lower-cased; the version
    line is kept under ``warc-version``. Body length comes from
    ``Content-Length`` (mandatory per ISO 28500)."""
    if payload[:2] == b"\x1f\x8b":
        records: list[tuple[dict, bytes]] = []
        for member in _split_gzip_members(payload):
            records.extend(parse_warc(member))
        return records
    records = []
    i = 0
    n = len(payload)
    while i < n:
        # tolerate inter-record padding CRLFs
        while i < n and payload[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if not payload[i:i + 5] == b"WARC/":
            raise ValueError("WARC record must start with a version line")
        hdr_end = payload.find(_CRLF + _CRLF, i)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = payload[i:hdr_end].split(_CRLF)
        headers = {"warc-version": lines[0].decode("ascii", "replace")}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        body = payload[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record body")
        records.append((headers, bytes(body)))
        i = body_start + clen
        if payload[i:i + 4] == _CRLF + _CRLF:
            i += 4
    return records


def build_warc(records: list[tuple[dict, bytes]],
               gzip_members: bool = False) -> bytes:
    """Spec-valid WARC bytes from (headers, body) pairs; with
    ``gzip_members`` each record becomes its own gzip member (the
    .warc.gz layout). ``Content-Length`` is (re)computed."""
    out = bytearray()
    for headers, body in records:
        rec = bytearray(b"WARC/1.0" + _CRLF)
        for k, v in headers.items():
            if k.lower() in ("warc-version", "content-length"):
                continue
            rec += f"{k}: {v}".encode() + _CRLF
        rec += b"Content-Length: %d" % len(body) + _CRLF + _CRLF
        rec += body + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


def synth_warc_payload(doc_id: int, text: str) -> bytes:
    """Deterministic WARC fixture per document: a warcinfo record + a
    response record whose body is the document text (UTF-8). Every second
    id uses per-record gzip members (the .warc.gz layout), so both
    container modes are exercised by the same gate query."""
    body = (text or "").encode("utf-8")
    records = [
        (
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": f"<urn:uuid:{int(doc_id):032x}>",
            },
            b"software: graphminingtools_ray",
        ),
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{int(doc_id) + 1:032x}>",
                "WARC-Target-URI": f"https://example.test/doc/{int(doc_id)}",
            },
            body,
        ),
    ]
    return build_warc(records, gzip_members=(int(doc_id) % 2 == 1))
