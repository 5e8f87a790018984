"""Tests for the ftp_manifest Python DataSource (Spark 4 API): listing
parity with the connector BFS, content reads, dot-dir semantics."""

from __future__ import annotations

import pytest

from ftp_blueprints_spark.sources.connector import ClientSpec
from ftp_blueprints_spark.sources.listing import list_tree

TREE = {
    "a/x.csv": b"x-data",
    "a/deep/y.csv": b"y-data",
    "b/z.txt": b"z",
    "top.bin": b"\x01\x02",
}


@pytest.fixture()
def tree(tmp_path):
    for rel, data in TREE.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)
    d = tmp_path / ".."  # not creatable; use a literal dot-dir instead
    d = tmp_path / "..."
    d.mkdir()
    (d / "hidden.csv").write_bytes(b"h")
    return tmp_path


@pytest.fixture()
def registered(spark):
    from ftp_blueprints_spark.sources.datasource import ManifestDataSource

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session
    return spark


def test_datasource_matches_list_tree(registered, tree):
    spark = registered
    df = (
        spark.read.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(tree))
        .load()
    )
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in list_tree(spark, ClientSpec(kind="local", root=str(tree)), "").collect()}
    assert got == want
    assert not any(r[2] == "..." for r in got)  # dot-dirs skipped


def test_datasource_keeps_dot_dirs_when_asked(registered, tree):
    df = (
        registered.read.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(tree))
        .option("skip_dot_dirs", "false")
        .load()
    )
    names = {r["name"] for r in df.collect()}
    assert "..." in names and "hidden.csv" in names


def test_datasource_with_content(registered, tree):
    df = (
        registered.read.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(tree))
        .option("with_content", "true")
        .load()
    )
    rows = {r["path"]: r for r in df.collect()}
    assert bytes(rows["a/x.csv"]["content"]) == b"x-data"
    assert bytes(rows["a/deep/y.csv"]["content"]) == b"y-data"
    assert rows["a"]["content"] is None  # dirs carry no bytes


def test_datasource_partitions_per_top_entry(registered, tree):
    """One input partition per root entry -> executor-parallel walk."""
    df = (
        registered.read.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(tree))
        .load()
    )
    # a/, b/, top.bin => 3 partitions
    assert df.rdd.getNumPartitions() == 3


def test_datasource_empty_tree(registered, tmp_path):
    """An empty root yields an empty frame (the sentinel partition
    emits no rows), not an error."""
    empty = tmp_path / "empty"
    empty.mkdir()
    df = (
        registered.read.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(empty))
        .load()
    )
    assert df.count() == 0


def test_datasource_write_uploads_local(registered, tmp_path):
    """df.write.format('ftp_manifest'): rows (dest_path, content) land
    as real files via temp-name + rename, with parent dirs created."""
    spark = registered
    dest_root = tmp_path / "up_srv"
    dest_root.mkdir()
    rows = [
        ("out/a.txt", bytearray(b"alpha")),
        ("out/nested/b.bin", bytearray(b"\x00\x01\x02")),
        ("c.txt", bytearray(b"top")),
    ]
    df = spark.createDataFrame(rows, "dest_path string, content binary")
    (
        df.write.format("ftp_manifest")
        .option("kind", "local")
        .option("root", str(dest_root))
        .mode("append")
        .save()
    )
    assert (dest_root / "out" / "a.txt").read_bytes() == b"alpha"
    assert (dest_root / "out" / "nested" / "b.bin").read_bytes() == b"\x00\x01\x02"
    assert (dest_root / "c.txt").read_bytes() == b"top"
    leftovers = [
        p for p in dest_root.rglob("*") if p.name.endswith(".__uploading__")
    ]
    assert leftovers == []


def test_datasource_write_roundtrip_over_ftp(registered, tmp_path):
    """Read a tree through the DataSource (with content), re-upload it
    through the DataSource WRITER over a real FTP socket, and get the
    identical bytes back — the full read+write DataSource loop."""
    from tests.ftp_stub_server import FtpStubServer

    spark = registered
    src = tmp_path / "src_srv"
    (src / "in").mkdir(parents=True)
    (src / "in" / "x.txt").write_bytes(b"xx")
    (src / "in" / "y.txt").write_bytes(b"yyy")
    dst = tmp_path / "dst_srv"
    dst.mkdir()
    users = {"alice": "secret"}
    with FtpStubServer(str(dst), users) as (host, port):
        files = (
            spark.read.format("ftp_manifest")
            .option("kind", "local")
            .option("root", str(src))
            .option("with_content", "true")
            .load()
            .filter("not is_dir")
            .selectExpr("concat('mirror/', name) AS dest_path", "content")
        )
        (
            files.write.format("ftp_manifest")
            .option("kind", "ftp")
            .option("host", host)
            .option("port", str(port))
            .option("username", "alice")
            .option("password", "secret")
            .mode("append")
            .save()
        )
    assert (dst / "mirror" / "x.txt").read_bytes() == b"xx"
    assert (dst / "mirror" / "y.txt").read_bytes() == b"yyy"


def test_datasource_write_retry_over_strict_rnto_ftp(registered, tmp_path):
    """Task-retry idempotency on RFC-strict servers: many FTP servers
    answer 550 to RNTO when the destination exists, so re-uploading
    over files a partially-committed attempt already landed must still
    succeed (best-effort DELE before the rename) and must replace the
    bytes — and a drained run leaves no '*.__uploading__' litter."""
    from tests.ftp_stub_server import FtpStubServer

    spark = registered
    dst = tmp_path / "dst_srv"
    (dst / "mirror").mkdir(parents=True)
    # the "first attempt" already committed these, with stale content
    (dst / "mirror" / "x.txt").write_bytes(b"stale")
    (dst / "mirror" / "y.txt").write_bytes(b"stale")
    rows = [("mirror/x.txt", bytearray(b"xx")), ("mirror/y.txt", bytearray(b"yyy"))]
    df = spark.createDataFrame(rows, "dest_path string, content binary")
    with FtpStubServer(str(dst), {"alice": "secret"}, strict_rnto=True) as (
        host,
        port,
    ):
        (
            df.write.format("ftp_manifest")
            .option("kind", "ftp")
            .option("host", host)
            .option("port", str(port))
            .option("username", "alice")
            .option("password", "secret")
            .mode("append")
            .save()
        )
    assert (dst / "mirror" / "x.txt").read_bytes() == b"xx"
    assert (dst / "mirror" / "y.txt").read_bytes() == b"yyy"
    assert [p for p in dst.rglob("*") if p.name.endswith(".__uploading__")] == []


def test_manifest_writer_cleans_temp_on_failure():
    """A failed store/rename must best-effort DELE its temp name so a
    dying task leaves nothing durable behind (DataSourceWriter.abort
    only hears from successful tasks — the failing task itself is the
    only place that knows the temp name)."""
    from ftp_blueprints_spark.sources.datasource import ManifestWriter

    class FakeClient:
        def __init__(self):
            self.stored: list[str] = []
            self.deleted: list[str] = []

        def makedirs(self, folder):
            pass

        def store(self, fileobj, path):
            self.stored.append(path)

        def delete(self, path):
            self.deleted.append(path)

        def rename(self, src, dst):
            raise OSError("550 destination exists")

        def close(self):
            pass

    class FakeSpec:
        def __init__(self, client):
            self._c = client

        def connect(self):
            return self._c

    w = ManifestWriter.__new__(ManifestWriter)
    client = FakeClient()
    w.spec = FakeSpec(client)
    import pytest as _pytest

    with _pytest.raises(OSError):
        w.write(iter([{"dest_path": "out/a.txt", "content": b"aa"}]))
    assert client.stored == ["out/a.txt.__uploading__"]
    # the failed task deleted its own temp (the dest delete attempt
    # before rename is also visible, but the temp MUST be last)
    assert client.deleted[-1] == "out/a.txt.__uploading__"
