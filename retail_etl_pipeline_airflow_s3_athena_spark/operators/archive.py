"""Compressed text-archive ingest (tar + gzip/bz2/xz, and ZIP — r12)
— the other container path real corpora arrive through (The Pile
ships .jsonl.zst and .tar member files; academic dumps ship .tar.gz /
.tar.xz; ZIP is the most common archive format corpora arrive in).

Sibling of operators/warc.py: pack the documents table into
deterministic archives, ingest them back distributed, prove the
round-trip with a REAL SQL oracle.  Everything stdlib:

- ``make_tar(members)``: an in-memory POSIX tar with every
  nondeterministic TarInfo field pinned (mtime=0, uid/gid=0, no
  uname/gname), so archive bytes are a pure function of content.
- Whole-archive compression with gzip (mtime=0) / bz2 / lzma(xz) —
  ``sniff_decompress`` routes on magic bytes (1F 8B / BZh / FD 37 7A
  58 5A).  zstd is NOT stdlib and fails loudly by name — the honest
  frontier.
- ``docs_to_tar(docs)``: one archive per source via ``applyInPandas``,
  cycling the three codecs deterministically by source so every gate
  run exercises all of them.
- ``tar_ingest(archives)``: shuffle-free Arrow projection — sniff,
  decompress, walk tar members, one output row per document.

Scale shape: identical to the WARC pair — pack is one groupBy-source
shuffle with archive-sized output rows; ingest parallelizes at
archive granularity (the unit real dump processing uses).  Memory is
bounded by archive size × Arrow batch, corpus-size independent.
"""

from __future__ import annotations

import bz2
import gzip as _gzip
import io
import lzma
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CODECS = ("gz", "bz2", "xz")


def make_tar(members: list[tuple[str, bytes]]) -> bytes:
    """[(name, content)] -> deterministic POSIX tar bytes (all
    metadata pinned)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def compress(data: bytes, codec: str) -> bytes:
    if codec == "gz":
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(data)
        return buf.getvalue()
    if codec == "bz2":
        return bz2.compress(data)
    if codec == "xz":
        return lzma.compress(data, format=lzma.FORMAT_XZ)
    raise ValueError(f"unknown codec {codec!r}")


def sniff_decompress(payload: bytes) -> bytes:
    """Route on magic bytes; loud-fail on containers outside the
    stdlib tier (zstd named explicitly — it is the one a reader will
    reach for first)."""
    if payload[:2] == b"\x1f\x8b":
        return _gzip.decompress(payload)
    if payload[:3] == b"BZh":
        return bz2.decompress(payload)
    if payload[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(payload)
    if payload[:4] == b"\x28\xb5\x2f\xfd":
        raise NotImplementedError(
            "zstd is not in the Python stdlib; gz/bz2/xz decode here"
        )
    if payload[:262].find(b"ustar") >= 0:
        return payload  # already a bare tar
    raise NotImplementedError(
        "unrecognized archive magic; tar(.gz/.bz2/.xz) only"
    )


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    data = sniff_decompress(payload)
    out = []
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
        for info in tf.getmembers():
            if not info.isfile():
                raise NotImplementedError(
                    f"non-file tar member {info.name!r} (links/devices "
                    "not supported)"
                )
            out.append((info.name, tf.extractfile(info).read()))
    return out


# ---------------------------------------------------------------------------
# ZIP (r12 — VERDICT r11 #4): the most common wild archive format,
# stdlib `zipfile`.  Same discipline as tar: deterministic pack (all
# timestamps pinned to the DOS epoch, attrs zeroed), per-member
# STORED/DEFLATED method cycle so every gate run exercises both
# decoders, loud-fail on the frontier (encrypted members, non-file
# compression methods).
# ---------------------------------------------------------------------------

ZIP_METHODS = (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED)
ZIP_METHOD_NAMES = {zipfile.ZIP_STORED: "stored", zipfile.ZIP_DEFLATED: "deflated"}


def make_zip(members: list[tuple[str, bytes]],
             methods: list[int] | None = None) -> bytes:
    """[(name, content)] -> deterministic ZIP bytes: date_time pinned
    to the DOS epoch (1980-01-01), create_system/external_attr zeroed,
    per-member method from ``methods`` (default DEFLATED)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, mode="w") as zf:
        for i, (name, content) in enumerate(members):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.create_system = 0
            info.external_attr = 0
            method = (
                methods[i] if methods is not None else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, content, compress_type=method)
    return buf.getvalue()


def parse_zip(payload: bytes) -> list[tuple[str, str, bytes]]:
    """ZIP bytes -> [(member name, method name, content)].  Directory
    entries are skipped; encrypted members and compression methods
    outside STORED/DEFLATED loud-fail by name."""
    out = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.flag_bits & 0x1:
                raise NotImplementedError(
                    f"encrypted zip member {info.filename!r} not supported"
                )
            if info.compress_type not in ZIP_METHOD_NAMES:
                raise NotImplementedError(
                    f"zip compression method {info.compress_type} on "
                    f"{info.filename!r} (stored/deflated only)"
                )
            out.append(
                (
                    info.filename,
                    ZIP_METHOD_NAMES[info.compress_type],
                    zf.read(info.filename),
                )
            )
    return out


# ---------------------------------------------------------------------------
# Distributed pack + ingest
# ---------------------------------------------------------------------------

TAR_ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

TAR_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("archive_id", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _codec_for(source: str) -> str:
    """Deterministic codec choice per source (cycles all three across
    a corpus so every run exercises every decompressor): the last
    character's byte value mod 3 — one char so the SQL twin is a
    single ``ord(substr(...))``."""
    return CODECS[source.encode()[-1] % len(CODECS)]


def docs_to_tar(docs: DataFrame) -> DataFrame:
    """One tar.{gz,bz2,xz} archive per source; member order pinned by
    doc_id, archive bytes fully deterministic."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        src = str(pdf["source"].iloc[0])
        members = [
            (
                f"{src}/{int(did)}.txt",
                ("" if txt is None else str(txt)).encode("utf-8"),
            )
            for did, txt in zip(pdf["doc_id"], pdf["text"])
        ]
        codec = _codec_for(src)
        return pd.DataFrame(
            [(src, codec, compress(make_tar(members), codec))],
            columns=["archive_id", "codec", "payload"],
        )

    return (
        docs.select("doc_id", "text", "source")
        .groupBy("source")
        .applyInPandas(pack, TAR_ARCHIVE_SCHEMA)
    )


def tar_ingest(archives: DataFrame) -> DataFrame:
    """tar.{gz,bz2,xz} binaries -> one row per member document."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, codec, payload in zip(
                pdf["archive_id"], pdf["codec"], pdf["payload"]
            ):
                for name, content in parse_tar(bytes(payload)):
                    doc_id = int(name.rsplit("/", 1)[1].split(".")[0])
                    rows.append(
                        (
                            doc_id,
                            str(aid),
                            str(codec),
                            content.decode("utf-8"),
                            len(content),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TAR_DOC_SCHEMA.fields]
            )

    return archives.mapInPandas(batches, TAR_DOC_SCHEMA)


def tar_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Gate query: documents -> per-source tar.{gz,bz2,xz} -> ingest.
    The oracle re-derives the codec column with the same
    sum-of-source-bytes rule in SQL, so even the codec ROUTING is
    value-hashed, not just the text."""
    return tar_ingest(docs_to_tar(docs)).select(
        "doc_id",
        F.col("archive_id").alias("source"),
        "codec",
        "text",
        "n_bytes",
    )


ZIP_ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

ZIP_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("archive_id", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def docs_to_zip(docs: DataFrame) -> DataFrame:
    """One ZIP archive per source; member order pinned by doc_id,
    per-member method cycling STORED/DEFLATED on doc_id % 2, archive
    bytes fully deterministic.  Same applyInPandas pack shape (and
    scale contract) as ``docs_to_tar``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        src = str(pdf["source"].iloc[0])
        members = [
            (
                f"{src}/{int(did)}.txt",
                ("" if txt is None else str(txt)).encode("utf-8"),
            )
            for did, txt in zip(pdf["doc_id"], pdf["text"])
        ]
        methods = [ZIP_METHODS[int(did) % 2] for did in pdf["doc_id"]]
        return pd.DataFrame(
            [(src, make_zip(members, methods))],
            columns=["archive_id", "payload"],
        )

    return (
        docs.select("doc_id", "text", "source")
        .groupBy("source")
        .applyInPandas(pack, ZIP_ARCHIVE_SCHEMA)
    )


def zip_ingest(archives: DataFrame) -> DataFrame:
    """ZIP binaries -> one row per member document (shuffle-free Arrow
    projection, archive = unit of parallelism — the tar_ingest
    contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                for name, method, content in parse_zip(bytes(payload)):
                    doc_id = int(name.rsplit("/", 1)[1].split(".")[0])
                    rows.append(
                        (
                            doc_id,
                            str(aid),
                            method,
                            content.decode("utf-8"),
                            len(content),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ZIP_DOC_SCHEMA.fields]
            )

    return archives.mapInPandas(batches, ZIP_DOC_SCHEMA)


def zip_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Gate query (r12): documents -> per-source ZIP (STORED/DEFLATED
    member cycle) -> ingest.  The oracle re-derives the method column
    from the same doc_id % 2 rule, so member METHOD routing is
    value-hashed along with the text."""
    return zip_ingest(docs_to_zip(docs)).select(
        "doc_id",
        F.col("archive_id").alias("source"),
        "method",
        "text",
        "n_bytes",
    )


def oracle_zip_roundtrip_sql() -> str:
    """DuckDB twin of zip_roundtrip_stats."""
    return """
        SELECT doc_id, source,
               CASE doc_id % 2 WHEN 0 THEN 'stored'
                    ELSE 'deflated' END AS method,
               text,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents ORDER BY doc_id
    """


def oracle_tar_roundtrip_sql() -> str:
    """DuckDB twin: text/source from the table; codec = the same
    deterministic last-byte cycle."""
    cases = ", ".join(f"'{c}'" for c in CODECS)
    return f"""
        SELECT doc_id, source,
               ([{cases}])[
                   1 + ord(substr(source, strlen(source), 1)) % 3
               ] AS codec,
               text,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents ORDER BY doc_id
    """
