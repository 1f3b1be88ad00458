"""WARC (ISO 28500) crawl-archive source — pure stdlib, no warcio.

The flagship pipeline's pages table (url, warc_ts, html, …) models a
Common-Crawl-style corpus; WARC is the public container those corpora
actually ship in.  This module closes the scan edge: real ``.warc`` /
``.warc.gz`` files feed the same DataFrame pipeline the synthetic pages do
(reference seam: the S4/SEN3 container scan, src/YAXTrees.jl:529-613 —
opaque archive in, columnar tree out; same honest-parsing approach as
sources/netcdf3.py and sources/zarr.py).

Format (ISO 28500 / WARC 1.0-1.1): a record is a version line
``WARC/1.x``, CRLF-terminated named headers, an empty line, exactly
``Content-Length`` content octets, then two CRLFs.  ``.warc.gz`` is the
member-per-record gzip convention; Python's gzip reader concatenates
members transparently, which is all the reader needs.

Scale design: the distributed scan parallelizes ACROSS archive files
(``binaryFile`` source → one task per file → ``mapInPandas`` record
split), which matches how crawl archives are shipped — Common Crawl cuts
WARCs at ~1 GB precisely so file-granular processing parallelizes.  The
parser is a generator over a bytes buffer (no per-record Python on the
hot columns afterwards — downstream extraction stays in Catalyst);
splitting a SINGLE multi-TB WARC would need a record-boundary-aware
input format, which Spark's binaryFile source does not provide — that
boundary is documented, not papered over.
"""

from __future__ import annotations

import gzip
import os
import uuid
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"
_CRLF = b"\r\n"

#: scan output schema (see scan_warc)
WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "http_status int, payload binary"
)


def write_warc(
    path: str,
    records: Iterable[dict],
    compress: bool | None = None,
) -> int:
    """Minimal conformant writer (fixtures + the ``warc_scan`` oracle
    query).  Each record dict: ``warc_type``, ``payload`` (bytes), and
    optionally ``target_uri``, ``warc_date``, ``content_type``,
    ``record_id``.  ``compress=None`` infers from the ``.gz`` suffix and
    writes one gzip member per record (the Common Crawl convention, which
    is what makes member-level random access possible).  Returns the
    record count."""
    if compress is None:
        compress = path.endswith(".gz")
    blobs = []
    n = 0
    for rec in records:
        payload = rec["payload"]
        if not isinstance(payload, (bytes, bytearray)):
            raise TypeError("payload must be bytes")
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec.get("record_id") or f"<urn:uuid:{uuid.uuid4()}>"),
            ("WARC-Date", rec.get("warc_date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(payload))),
        ]
        if rec.get("target_uri"):
            headers.insert(3, ("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}".encode() + _CRLF for k, v in headers
        )
        blob = head + _CRLF + bytes(payload) + _CRLF + _CRLF
        blobs.append(gzip.compress(blob, mtime=0) if compress else blob)
        n += 1
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(b"".join(blobs))
    os.replace(tmp, path)
    return n


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Iterate records of one WARC archive held in memory (a crawl-cut
    file, ~1 GB by convention).  Transparently inflates ``.warc.gz``
    (concatenated gzip members).  Yields dicts with the raw header map
    plus ``payload``; raises ``ValueError`` on structural damage rather
    than resynchronizing silently."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)
    pos, size = 0, len(data)
    while pos < size:
        # tolerate inter-record padding CRLFs (some writers emit extras)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= size:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"missing/invalid Content-Length at offset {pos}") from exc
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > size:
            raise ValueError(f"truncated record at offset {pos} (wants {length} octets)")
        yield {
            "version": lines[0],
            "headers": headers,
            "payload": data[body_start:body_end],
        }
        pos = body_end


def split_http_response(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) of an HTTP response payload: status from the first
    line, body after the blank line.  (None, payload) when it isn't HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(_CRLF + _CRLF)
    head = payload if sep < 0 else payload[:sep]
    body = b"" if sep < 0 else payload[sep + 4 :]
    parts = head.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, payload
    return status, body


def scan_warc(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Distributed WARC scan: one row per record, one TASK per archive
    file (the crawl-convention parallelism unit).  ``binaryFile`` lists
    and ships each file to an executor; ``mapInPandas`` runs the record
    splitter there — the driver never touches record bytes.  HTTP
    response payloads surface ``http_status`` and the payload AFTER the
    HTTP headers (the html); other record types keep the raw payload."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def _explode(batches):
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "path", "record_id", "warc_type", "target_uri", "warc_date",
                "content_type", "content_length", "http_status", "payload",
            )}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(blob)):
                    h = rec["headers"]
                    status, body = split_http_response(rec["payload"])
                    out["path"].append(fpath)
                    out["record_id"].append(h.get("warc-record-id", ""))
                    out["warc_type"].append(h.get("warc-type", ""))
                    out["target_uri"].append(h.get("warc-target-uri"))
                    out["warc_date"].append(h.get("warc-date"))
                    out["content_type"].append(h.get("content-type"))
                    out["content_length"].append(int(h["content-length"]))
                    out["http_status"].append(status)
                    out["payload"].append(body if status is not None else rec["payload"])
            yield pd.DataFrame(out)

    return files.mapInPandas(_explode, schema=WARC_SCHEMA)
