"""Archive explosion (sources/archive.py)."""

import gzip

import pytest

from jsoup_spark.sources.archive import (
    archive_stage, build_tar, build_zip, iter_archive, sniff_archive)

MEMBERS = [("a/first.txt", b"hello first"),
           ("b/second.html", b"<p>two</p>"),
           ("third.bin", bytes(range(50)))]


@pytest.mark.parametrize("compress", ["", "gz", "bz2", "xz"])
def test_tar_roundtrip(compress):
    data = build_tar(MEMBERS, compress=compress)
    kind = sniff_archive(data)
    assert kind == ("tar" if not compress else f"tar.{compress}")
    assert list(iter_archive(data)) == MEMBERS


@pytest.mark.parametrize("stored", [False, True])
def test_zip_roundtrip(stored):
    data = build_zip(MEMBERS, stored=stored)
    assert sniff_archive(data) == "zip"
    assert list(iter_archive(data)) == MEMBERS


def test_tar_dirs_skipped_and_pre_posix_checksum():
    import io
    import tarfile
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:", format=tarfile.GNU_FORMAT) as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("dir/f.txt")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    data = buf.getvalue()
    assert list(iter_archive(data)) == [("dir/f.txt", b"abc")]


def test_bad_archive_raises():
    with pytest.raises(ValueError):
        list(iter_archive(b"not an archive at all" * 30))
    with pytest.raises(ValueError):
        list(iter_archive(b"PK\x03\x04corrupt"))


def test_member_gzip_inflates_through_ingest(spark):
    inner = "compressed member text"
    members = [("plain.txt", b"plain text"),
               ("inner.gz", gzip.compress(inner.encode()))]
    rows = [(1, bytearray(build_tar(members, compress="gz"))),
            (2, bytearray(build_zip(members))),
            (3, bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {}
    for r in archive_stage(df).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for did in (1, 2):
        got = {r["member"]: r["text"] for r in out[did]}
        assert got["plain.txt"] == "plain text"
        assert got["inner.gz"] == inner            # ingest tier inflated
        assert all(r["ok"] for r in out[did])
    assert out[3][0]["ok"] is False
