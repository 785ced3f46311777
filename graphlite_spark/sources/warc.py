"""WARC (Web ARChive, ISO 28500) ingestion — the format large-scale
web-crawl curation actually starts from (Common Crawl ships WARC).

Reference scope note: the reference engine has no web-archive surface;
this is beyond-reference pipeline infrastructure, same category as the
multimodal probes. Pure stdlib parsing (the container has no warcio),
Arrow-batched executor-side, streaming-capable:

- parse_warc_bytes: the kernel — walk WARC/1.0 records, parse record
  headers case-insensitively, split HTTP head/body for response
  records, tolerate gzip (whole-file OR the standard per-record
  concatenated-member layout of .warc.gz).
- synth_warc: deterministic writer for tests/oracles (the synth_html
  discipline — round-trips through the parser exactly).
- warc_records: DataFrame operator over a binary content column
  (e.g. spark.read.format('binaryFile')), one exploded row per
  response record. Runs verbatim on a readStream binaryFile source
  (mapInPandas is stateless) — the true ingest edge for
  streaming_curation.

Scale shape: parallelism is file-granular (one WARC = one task), which
is the work unit every published crawl pipeline uses — Common Crawl
segments are ~1 GiB so a 100 TB crawl is ~100k parallel units; no
shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a gzip stream of one or more CONCATENATED members
    (the .warc.gz convention: one member per record) into one buffer."""
    import zlib

    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def parse_warc_bytes(data: bytes, max_body_bytes: int = 1 << 20):
    """Yield one dict per WARC record: warc_type, target_uri,
    record_id, warc_date, content_type (the HTTP payload's, for
    responses), http_status, body (bytes, truncated to
    ``max_body_bytes``). Malformed trailing bytes stop the walk
    (crawl files end in truncation more often than not); a malformed
    LEADING header raises ValueError."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    first = True
    while pos < len(data):
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            if first:
                raise ValueError("WARC: no record header found")
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            if first:
                raise ValueError(
                    f"WARC: bad version line {lines[0][:40]!r}")
            break
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            # a corrupt/missing Content-Length on the FIRST record is
            # a malformed file (the leading-header contract), not a
            # truncated tail — swallowing it would make the whole file
            # indistinguishable from an empty crawl
            if first:
                raise ValueError(
                    "WARC: first record has no valid Content-Length")
            break
        if clen < 0:
            # a negative length would move pos BACKWARD: a
            # self-consistent header (clen == -(head+4)) re-parses the
            # same record forever — attacker-controlled crawl bytes
            # must never drive an unbounded generator
            if first:
                raise ValueError(
                    f"WARC: negative Content-Length {clen}")
            break
        first = False
        body_start = head_end + 4
        payload = data[body_start:body_start + clen]
        pos = body_start + clen
        rec = {
            "warc_type": hdrs.get("warc-type"),
            "target_uri": hdrs.get("warc-target-uri"),
            "record_id": hdrs.get("warc-record-id"),
            "warc_date": hdrs.get("warc-date"),
            "content_type": None,
            "http_status": None,
            "body": payload[:max_body_bytes],
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            he = payload.find(_CRLF + _CRLF)
            if he >= 0:
                http_head = payload[:he].decode("utf-8", "replace")
                hlines = http_head.split("\r\n")
                parts = hlines[0].split(" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for ln in hlines[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        rec["content_type"] = v.strip()
                rec["body"] = payload[he + 4:he + 4 + max_body_bytes]
        yield rec


def synth_warc(records, date: str = "2024-01-01T00:00:00Z",
               gzip_records: bool = False) -> bytes:
    """Deterministic WARC/1.0 writer for tests and oracles: a warcinfo
    record followed by one response record per (uri, body, content_type)
    tuple (body str or bytes). ``gzip_records`` emits the standard
    .warc.gz layout — each record its own gzip member. No RNG, no
    clock: record ids derive from the uri, the date is a parameter."""
    import gzip

    def record(headers: list, payload: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
            ) + f"Content-Length: {len(payload)}\r\n".encode()
        return head + _CRLF + payload + _CRLF + _CRLF

    info_payload = b"software: graphlite-spark-synth\r\n"
    out = [record(
        [("WARC-Type", "warcinfo"), ("WARC-Date", date),
         ("WARC-Record-ID", "<urn:uuid:warcinfo-0>"),
         ("Content-Type", "application/warc-fields")],
        info_payload)]
    for uri, body, ctype in records:
        payload_body = body.encode() if isinstance(body, str) else body
        http = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Type: {ctype}\r\n".encode()
                + f"Content-Length: {len(payload_body)}\r\n".encode()
                + _CRLF + payload_body)
        out.append(record(
            [("WARC-Type", "response"), ("WARC-Target-URI", uri),
             ("WARC-Date", date),
             ("WARC-Record-ID", f"<urn:uuid:{uri}>"),
             ("Content-Type",
              "application/http; msgtype=response")],
            http))
    if gzip_records:
        return b"".join(
            gzip.compress(r, compresslevel=1, mtime=0) for r in out)
    return b"".join(out)


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    path_col: str | None = "path",
    responses_only: bool = True,
    max_body_bytes: int = 1 << 20,
) -> DataFrame:
    """Explode a binary WARC column into one row per record:
    (warc_file, target_uri, warc_type, http_status, content_type,
    body string). ``df`` is typically spark.read.format('binaryFile')
    (or its readStream twin — the operator is stateless mapInPandas,
    so it runs on streams verbatim). Bodies are utf-8-decoded with
    replacement (curation text path); cap with ``max_body_bytes``.
    """
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    cols = [F.col(content_col).alias("_c")]
    if path_col and path_col in df.columns:
        cols.insert(0, F.col(path_col).alias("_p"))
    else:
        cols.insert(0, F.lit(None).cast("string").alias("_p"))
    base = df.select(*cols)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {"warc_file": [], "target_uri": [], "warc_type": [],
                   "http_status": [], "content_type": [], "body": []}
            for p, c in zip(pdf["_p"], pdf["_c"]):
                for rec in parse_warc_bytes(bytes(c), max_body_bytes):
                    if responses_only and rec["warc_type"] != "response":
                        continue
                    out["warc_file"].append(p)
                    out["target_uri"].append(rec["target_uri"])
                    out["warc_type"].append(rec["warc_type"])
                    out["http_status"].append(rec["http_status"])
                    out["content_type"].append(rec["content_type"])
                    out["body"].append(
                        rec["body"].decode("utf-8", "replace"))
            if out["warc_file"]:
                yield pd.DataFrame(out)

    schema = StructType([
        StructField("warc_file", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("body", StringType(), True),
    ])
    return base.mapInPandas(gen, schema)
