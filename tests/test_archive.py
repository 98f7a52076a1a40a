"""Compressed tar text-archive pack/ingest (operators/archive.py)."""

from __future__ import annotations

import pytest

from retail_etl_pipeline_airflow_s3_athena_spark.operators import archive as A

MEMBERS = [
    ("s/1.txt", "hällo wörld".encode("utf-8")),
    ("s/2.txt", b""),
    ("s/3.txt", b"y" * 5000),
]


def test_tar_roundtrip_all_codecs_and_bare():
    tar = A.make_tar(MEMBERS)
    assert A.parse_tar(tar) == MEMBERS
    for codec in A.CODECS:
        assert A.parse_tar(A.compress(tar, codec)) == MEMBERS


def test_archives_are_deterministic():
    """Every nondeterministic TarInfo/gzip field is pinned, so archive
    bytes are a pure function of content — the property the gate's
    value hash rests on."""
    a = A.compress(A.make_tar(MEMBERS), "gz")
    b = A.compress(A.make_tar(MEMBERS), "gz")
    assert a == b


def test_loud_fail_frontier():
    with pytest.raises(NotImplementedError, match="zstd"):
        A.sniff_decompress(b"\x28\xb5\x2f\xfd" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        A.sniff_decompress(b"random bytes that are no archive at all" * 10)
    # non-file members (a symlink) must fail loudly, not silently skip
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="link")
        info.type = tarfile.SYMTYPE
        info.linkname = "target"
        tf.addfile(info)
    with pytest.raises(NotImplementedError, match="non-file"):
        A.parse_tar(buf.getvalue())


def test_codec_routing_rule_matches_sql_twin():
    """_codec_for and the oracle SQL must agree (the rule is hashed)."""
    import duckdb

    for src in ["src0", "src1", "src2", "src13", "src19"]:
        (got,) = duckdb.connect().execute(
            f"SELECT (['gz','bz2','xz'])[1 + ord(substr('{src}', "
            f"strlen('{src}'), 1)) % 3]"
        ).fetchone()
        assert got == A._codec_for(src)


def test_distributed_roundtrip_equals_source_table(spark, sf_dir):
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    out = A.tar_roundtrip_stats(docs).orderBy("doc_id").collect()
    src = docs.select("doc_id", "source", "text").orderBy("doc_id").collect()
    assert len(out) == len(src)
    codecs_seen = set()
    for o, s in zip(out, src):
        assert (o["doc_id"], o["source"], o["text"]) == (
            s["doc_id"], s["source"], s["text"]
        )
        assert o["codec"] == A._codec_for(s["source"])
        codecs_seen.add(o["codec"])
    assert codecs_seen == set(A.CODECS)  # the cycle exercises all three


def test_zip_roundtrip_and_determinism():
    """r12 ZIP tier: stored + deflated members round-trip, archive
    bytes are a pure function of content."""
    methods = [A.ZIP_METHODS[i % 2] for i in range(len(MEMBERS))]
    payload = A.make_zip(MEMBERS, methods)
    assert payload == A.make_zip(MEMBERS, methods)
    got = A.parse_zip(payload)
    assert [(n, c) for n, _, c in got] == MEMBERS
    assert [m for _, m, _ in got] == ["stored", "deflated", "stored"]
    # the deflated wire really compresses: a 5000-byte run must shrink
    all_deflated = A.make_zip(MEMBERS, [A.ZIP_METHODS[1]] * 3)
    all_stored = A.make_zip(MEMBERS, [A.ZIP_METHODS[0]] * 3)
    assert len(all_deflated) < len(all_stored) - 4000


def test_zip_loud_fail_frontier():
    import io
    import zipfile

    # encrypted member: flag bit 0 set
    payload = bytearray(A.make_zip(MEMBERS[:1]))
    idx = payload.index(b"PK\x03\x04") + 6
    payload[idx] |= 0x1
    # central directory flag too
    cidx = payload.index(b"PK\x01\x02") + 8
    payload[cidx] |= 0x1
    with pytest.raises(NotImplementedError):
        A.parse_zip(bytes(payload))
    # exotic compression method (bzip2 = 12) via raw zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_BZIP2) as zf:
        zf.writestr("a.txt", b"x")
    with pytest.raises(NotImplementedError):
        A.parse_zip(buf.getvalue())
    # directory entries are skipped, not failed
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr(zipfile.ZipInfo("d/", (1980, 1, 1, 0, 0, 0)), b"")
        zf.writestr(zipfile.ZipInfo("d/f.txt", (1980, 1, 1, 0, 0, 0)), b"ok")
    assert [(n, c) for n, _, c in A.parse_zip(buf2.getvalue())] == [
        ("d/f.txt", b"ok")
    ]


def test_zip_distributed_roundtrip_equals_source_table(spark, sf_dir):
    from retail_etl_pipeline_airflow_s3_athena_spark.sources import readers

    docs = readers.read_documents(spark, sf_dir)
    out = A.zip_roundtrip_stats(docs).orderBy("doc_id").collect()
    src = docs.select("doc_id", "source", "text").orderBy("doc_id").collect()
    assert len(out) == len(src)
    methods_seen = set()
    for o, s in zip(out, src):
        assert (o["doc_id"], o["source"], o["text"]) == (
            s["doc_id"], s["source"], s["text"]
        )
        assert o["method"] == ("stored" if s["doc_id"] % 2 == 0 else "deflated")
        methods_seen.add(o["method"])
    assert methods_seen == {"stored", "deflated"}
