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
