"""End-to-end tests of the ``kind='ftp'`` path against a real (local,
in-process) FTP server speaking RFC 959 over sockets: S1 session open
(incl. bad-credential exit-3 semantics), S2 listing + cwd-probe
classification, S3 parallel BFS, S6-S10 action sinks, and the
ftp_manifest DataSource — the same code paths a production FTP server
would exercise, minus the network.
"""

from __future__ import annotations

import io
import os

import pytest

from ftp_blueprints_spark.errors import (
    IncorrectCredentials,
    InvalidFilePath,
    MoveError,
    UploadError,
)
from ftp_blueprints_spark.operators import actions
from ftp_blueprints_spark.sources.connector import ClientSpec
from ftp_blueprints_spark.sources.listing import list_tree

from .ftp_stub_server import FtpStubServer

USERS = {"alice": "secret"}

TREE = {
    "data/a.csv": b"alpha,1\n",
    "data/b.csv": b"beta,2\n",
    "data/sub/c.txt": b"gamma",
    "data/.../hidden.csv": b"dot-dir",
    "top.bin": b"\x00\x01",
}


@pytest.fixture()
def ftp_root(tmp_path):
    for rel, payload in TREE.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
    return str(tmp_path)


def spec_for(host: str, port: int, **kw) -> ClientSpec:
    return ClientSpec(
        kind="ftp", host=host, port=port, username="alice", password="secret",
        timeout=10, max_connections=4, **kw,
    )


# --- S1: session open -------------------------------------------------------

def test_bad_credentials_raise_exit3_error(ftp_root):
    with FtpStubServer(ftp_root, USERS) as (host, port):
        bad = ClientSpec(kind="ftp", host=host, port=port,
                         username="alice", password="wrong", timeout=10)
        with pytest.raises(IncorrectCredentials) as ei:
            bad.connect()
        assert ei.value.exit_code == 3


# --- S2: listing + classification ------------------------------------------

def test_listdir_classifies_and_prefixes_bare_names(ftp_root):
    with FtpStubServer(ftp_root, USERS) as (host, port):
        client = spec_for(host, port).connect()
        try:
            got = client.listdir("data")
        finally:
            client.close()
    by_path = {p: (d, s) for p, d, s in got}
    # NLST returned bare names; the client prefixed the folder
    assert by_path["data/a.csv"] == (False, len(TREE["data/a.csv"]))
    assert by_path["data/sub"] == (True, None)  # cwd-probe says directory
    assert by_path["data/..."][0] is True


# --- S2+S3: parallel BFS into the manifest ---------------------------------

def test_list_tree_over_ftp(spark, ftp_root):
    with FtpStubServer(ftp_root, USERS) as (host, port):
        mf = list_tree(spark, spec_for(host, port), "data")
        rows = {r["path"]: r for r in mf.collect()}
    assert set(rows) == {"data/a.csv", "data/b.csv", "data/sub", "data/sub/c.txt"}
    assert rows["data/sub"]["is_dir"] is True
    assert rows["data/sub/c.txt"]["size"] == len(TREE["data/sub/c.txt"])
    # dot-dir pruned during traversal (F4), so its children never appear
    assert not any("hidden" in p for p in rows)


# --- DataSource over FTP ----------------------------------------------------

def test_datasource_reads_content_over_ftp(spark, ftp_root):
    from ftp_blueprints_spark.sources.datasource import ManifestDataSource

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session
    with FtpStubServer(ftp_root, USERS) as (host, port):
        df = (
            spark.read.format("ftp_manifest")
            .option("kind", "ftp").option("host", host).option("port", str(port))
            .option("username", "alice").option("password", "secret")
            .option("timeout", "10")
            .option("folder", "data")
            .option("with_content", "true")
            .load()
        )
        rows = {r["path"]: r for r in df.collect()}
    assert bytes(rows["data/a.csv"]["content"]) == TREE["data/a.csv"]
    assert bytes(rows["data/sub/c.txt"]["content"]) == TREE["data/sub/c.txt"]
    assert rows["data/sub"]["content"] is None


# --- S6/D1: download sink (per-row skip) -----------------------------------

def test_download_sink_skips_bad_rows(spark, ftp_root, tmp_path):
    dest = tmp_path / "out"
    manifest = spark.createDataFrame(
        [("data/a.csv", "a.csv"), ("data/missing.csv", "missing.csv"),
         ("data/sub/c.txt", "nested/c.txt")],
        "path string, dest_path string",
    )
    with FtpStubServer(ftp_root, USERS) as (host, port):
        result = actions.download(manifest, spec_for(host, port), str(dest))
    assert result == {"ok": 2, "failed": 1}
    assert (dest / "a.csv").read_bytes() == TREE["data/a.csv"]
    assert (dest / "nested/c.txt").read_bytes() == TREE["data/sub/c.txt"]
    assert not (dest / "missing.csv").exists()
    assert not list(dest.glob("*.inprogress"))  # no partial outputs


# --- S7+S8/D2: upload sink (fail-fast, mkdir -p) ----------------------------

def test_upload_sink_creates_remote_dirs(spark, ftp_root, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "x.csv").write_bytes(b"xx")
    manifest = spark.createDataFrame(
        [(str(src / "x.csv"), "incoming/deep/x.csv"),
         (str(src), "ignored-dir")],  # non-file source: silent skip
        "path string, dest_path string",
    )
    with FtpStubServer(ftp_root, USERS) as (host, port):
        result = actions.upload(manifest, spec_for(host, port))
    assert result == {"ok": 1, "skipped": 1}
    assert (
        os.path.join(ftp_root, "incoming/deep/x.csv")
        and open(os.path.join(ftp_root, "incoming/deep/x.csv"), "rb").read() == b"xx"
    )


def test_upload_fail_fast_on_readonly_server(spark, ftp_root, tmp_path):
    f = tmp_path / "y.csv"
    f.write_bytes(b"yy")
    manifest = spark.createDataFrame(
        [(str(f), "y.csv")], "path string, dest_path string"
    )
    with FtpStubServer(ftp_root, USERS, readonly=True) as (host, port):
        with pytest.raises(UploadError):
            actions.upload(manifest, spec_for(host, port))


# --- S9/D2: move (server-side rename) --------------------------------------

def test_move_renames_server_side(spark, ftp_root):
    manifest = spark.createDataFrame(
        [("data/a.csv", "archive/a.csv")], "path string, dest_path string"
    )
    with FtpStubServer(ftp_root, USERS) as (host, port):
        result = actions.move(manifest, spec_for(host, port))
    assert result == {"ok": 1}
    assert not os.path.exists(os.path.join(ftp_root, "data/a.csv"))
    assert open(os.path.join(ftp_root, "archive/a.csv"), "rb").read() == TREE["data/a.csv"]


def test_move_fail_fast_exit202(spark, ftp_root):
    manifest = spark.createDataFrame(
        [("data/nope.csv", "archive/nope.csv")], "path string, dest_path string"
    )
    with FtpStubServer(ftp_root, USERS) as (host, port):
        with pytest.raises(MoveError) as ei:
            actions.move(manifest, spec_for(host, port))
    assert ei.value.exit_code == 202


# --- S10/D2: delete ---------------------------------------------------------

def test_delete_removes_files_fail_fast_exit201(spark, ftp_root):
    ok = spark.createDataFrame([("data/b.csv",)], "path string")
    with FtpStubServer(ftp_root, USERS) as (host, port):
        assert actions.delete(ok, spec_for(host, port)) == {"ok": 1}
        assert not os.path.exists(os.path.join(ftp_root, "data/b.csv"))
        bad = spark.createDataFrame([("data/b.csv",)], "path string")
        with pytest.raises(InvalidFilePath) as ei:
            actions.delete(bad, spec_for(host, port))
        assert ei.value.exit_code == 201


# --- raw client round-trip --------------------------------------------------

def test_client_store_retrieve_roundtrip(ftp_root):
    with FtpStubServer(ftp_root, USERS) as (host, port):
        client = spec_for(host, port).connect()
        try:
            client.makedirs("up/loads")
            client.store(io.BytesIO(b"payload"), "up/loads/p.bin")
            out = io.BytesIO()
            client.retrieve("up/loads/p.bin", out)
        finally:
            client.close()
    assert out.getvalue() == b"payload"


# --- CSV-over-FTP ingestion to parquet --------------------------------------

def test_ingest_csv_over_ftp(spark, tmp_path):
    from ftp_blueprints_spark.sources.ingest import ingest_csv

    root = tmp_path / "srv"
    (root / "in" / "sub").mkdir(parents=True)
    (root / "in" / "one.csv").write_text("id,name,qty\n1,ant,10\n2,bee,20\n")
    (root / "in" / "sub" / "two.csv").write_text("id,name,qty\n3,cat,30\n")
    (root / "in" / "notes.txt").write_text("not a csv")
    dest = str(tmp_path / "out.parquet")

    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_csv(
            spark, spec_for(host, port), "in",
            schema="id int, name string, qty int", dest=dest,
        )
    assert n == 3
    got = {
        (r["id"], r["name"], r["qty"], r["src_path"], r["line_no"])
        for r in spark.read.parquet(dest).collect()
    }
    assert got == {
        (1, "ant", 10, "in/one.csv", 1),
        (2, "bee", 20, "in/one.csv", 2),
        (3, "cat", 30, "in/sub/two.csv", 1),
    }


def test_ingest_csv_partitioned_prunes(spark, tmp_path):
    """Partitioned ingest: read-back with a partition predicate scans
    only the matching directory (PartitionFilters, not data filters)."""
    from ftp_blueprints_spark.sources.ingest import ingest_csv

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    (root / "in" / "d.csv").write_text(
        "id,grp\n1,a\n2,b\n3,a\n4,b\n"
    )
    dest = str(tmp_path / "part.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_csv(
            spark, spec_for(host, port), "in",
            schema="id int, grp string", dest=dest, partition_cols=["grp"],
        )
    assert n == 4
    back = spark.read.parquet(dest).filter("grp = 'a'")
    assert {r["id"] for r in back.collect()} == {1, 3}
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(grp" in plan


def test_cli_ingest_local(spark, tmp_path):
    from ftp_blueprints_spark.cli.blueprints import ingest_main

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    (root / "in" / "one.csv").write_text("id,name,qty\n1,ant,10\n2,bee,20\n")
    dest = str(tmp_path / "cli_out.parquet")
    rc = ingest_main([
        "--kind", "local", "--root", str(root),
        "--source-folder-name", "in",
        "--source-file-name", r".*\.csv$",
        "--schema", "id int, name string, qty int",
        "--dest", dest,
    ])
    assert rc == 0
    assert spark.read.parquet(dest).count() == 2


def test_ingest_no_matching_files_writes_empty(spark, tmp_path):
    from ftp_blueprints_spark.sources.ingest import ingest_csv

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    (root / "in" / "notes.txt").write_text("not a csv")
    dest = str(tmp_path / "empty_out.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_csv(
            spark, spec_for(host, port), "in",
            schema="id int, name string", dest=dest,
        )
    assert n == 0
    assert spark.read.parquet(dest).count() == 0


def test_cli_download_over_ftp(spark, ftp_root, tmp_path):
    """The full reference pipeline over real FTP: CLI arg surface ->
    BFS listing -> regex basename match -> destination projection ->
    download sink, exit code 0; then exit 200 when nothing matches."""
    from ftp_blueprints_spark.cli.blueprints import download_main

    dest = tmp_path / "dl"
    with FtpStubServer(ftp_root, USERS) as (host, port):
        args = [
            "--kind", "ftp", "--host", host, "--port", str(port),
            "--username", "alice", "--password", "secret", "--timeout", "10",
            "--source-folder-name", "data",
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
            "--destination-root", str(dest),
        ]
        assert download_main(args) == 0
        got = sorted(p.name for p in dest.rglob("*") if p.is_file())
        # no explicit destination name -> source basenames, no numbering
        assert got == ["a.csv", "b.csv"]
        # explicit destination name over >1 match -> P4 numbered fan-out
        dest2 = tmp_path / "dl2"
        assert download_main(
            args[:-1] + [str(dest2), "--destination-file-name", "out.csv"]
        ) == 0
        got2 = sorted(p.name for p in dest2.rglob("*") if p.is_file())
        assert got2 == ["out_1.csv", "out_2.csv"]
        assert download_main(
            args[:-4] + ["--source-file-name", r"nothing\.matches",
                         "--source-file-name-match-type", "regex_match",
                         "--destination-root", str(dest)]
        ) == 200


def test_cli_upload_over_ftp_lists_local_tree(spark, tmp_path):
    """Regression: upload must ENUMERATE the local source tree and act
    against the remote server (the reference globs the local
    filesystem, upload_file.py:136-144). A previous version listed the
    REMOTE tree to decide what to upload, so a file that did not
    already exist on the server could never be uploaded."""
    from ftp_blueprints_spark.cli.blueprints import upload_main

    local = tmp_path / "src"
    (local / "out").mkdir(parents=True)
    (local / "out" / "fresh.csv").write_text("id\n1\n")
    srv = tmp_path / "srv"
    srv.mkdir()  # server starts EMPTY — nothing to list remotely
    with FtpStubServer(str(srv), USERS) as (host, port):
        rc = upload_main([
            "--kind", "ftp", "--host", host, "--port", str(port),
            "--username", "alice", "--password", "secret", "--timeout", "10",
            "--root", str(local),
            "--source-folder-name", "out",
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
            "--destination-folder-name", "landed",
        ])
    assert rc == 0
    assert (srv / "landed" / "fresh.csv").read_text() == "id\n1\n"


def test_cli_bad_credentials_exit3_from_executor(spark, ftp_root):
    """Regression: a login failure happens INSIDE an executor task
    (spec.connect() in the listing partition), surfaces as a raw Py4J
    error, and must still map to the reference's exit code 3 — not an
    unhandled traceback / exit 1."""
    from ftp_blueprints_spark.cli.blueprints import download_main

    with FtpStubServer(ftp_root, USERS) as (host, port):
        rc = download_main([
            "--kind", "ftp", "--host", host, "--port", str(port),
            "--username", "alice", "--password", "WRONG", "--timeout", "10",
            "--source-folder-name", "data",
            "--source-file-name", r".*\.csv",
            "--source-file-name-match-type", "regex_match",
        ])
    assert rc == 3


def test_csv_header_drop_survives_leading_blank_line(spark):
    """Regression: blank lines are filtered before the header drop, so
    a file whose FIRST physical line is blank has its header at idx 1 —
    a fixed `idx > 0` filter leaked that header as a data row. The drop
    now targets the first NON-EMPTY line per file."""
    from ftp_blueprints_spark.sources.ingest import parse_csv_files

    files = spark.createDataFrame(
        [
            ("lead_blank.csv", b"\nid,name\n1,ant\n"),
            ("normal.csv", b"id,name\n2,bee\n"),
        ],
        "path string, content binary",
    )
    rows = parse_csv_files(files, "id int, name string", header=True).collect()
    got = {(r["src_path"], r["id"], r["name"]) for r in rows}
    assert got == {("lead_blank.csv", 1, "ant"), ("normal.csv", 2, "bee")}
    assert not any(r["name"] == "name" for r in rows), "header leaked"
    # line_no is the offset FROM THE HEADER (1 = first data line), not
    # the physical index — the leading-blank file's first data row sits
    # at physical idx 2 but must still report line_no 1.
    assert {(r["src_path"], r["line_no"]) for r in rows} == {
        ("lead_blank.csv", 1),
        ("normal.csv", 1),
    }


def test_ingest_jsonl_over_ftp(spark, tmp_path):
    from ftp_blueprints_spark.sources.ingest import ingest_jsonl

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    (root / "in" / "a.jsonl").write_text(
        '{"id": 1, "text": "hello", "score": 0.5}\n'
        '{"id": 2, "text": "world", "score": 1.5}\n'
        "not json at all\n"
    )
    dest = str(tmp_path / "jl.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_jsonl(
            spark, spec_for(host, port), "in",
            schema="id int, text string, score double", dest=dest,
        )
    assert n == 3  # bad line kept with null fields + lineage
    rows = {r["line_no"]: r for r in spark.read.parquet(dest).collect()}
    assert rows[1]["text"] == "hello" and rows[2]["score"] == 1.5
    assert rows[3]["id"] is None and rows[3]["src_path"] == "in/a.jsonl"


def test_ingest_parquet_over_ftp(spark, tmp_path):
    """Parquet-over-FTP: bytes fetched executor-side via the manifest
    DataSource, parsed with pyarrow in mapInPandas, lineage preserved,
    column projection honored."""
    import pandas as pd

    from ftp_blueprints_spark.sources.ingest import ingest_parquet

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    pd.DataFrame(
        {"id": [1, 2, 3], "text": ["a", "b", "c"], "extra": [9.0, 8.0, 7.0]}
    ).to_parquet(root / "in" / "p1.parquet")
    pd.DataFrame({"id": [4], "text": ["d"], "extra": [6.0]}).to_parquet(
        root / "in" / "p2.parquet"
    )
    dest = str(tmp_path / "pq_out.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_parquet(
            spark, spec_for(host, port), "in",
            schema="id int, text string", dest=dest,
        )
    assert n == 4
    out = spark.read.parquet(dest)
    assert sorted(out.columns) == ["id", "row_no", "src_path", "text"]  # extra pruned
    rows = {(r["src_path"], r["row_no"]): r for r in out.collect()}
    assert rows[("in/p1.parquet", 2)]["text"] == "b"
    assert rows[("in/p2.parquet", 1)]["id"] == 4


def test_cli_ingest_format_parquet(spark, tmp_path):
    import pandas as pd

    from ftp_blueprints_spark.cli.blueprints import ingest_main

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    pd.DataFrame({"id": [7, 8], "name": ["x", "y"]}).to_parquet(
        root / "in" / "t.parquet"
    )
    dest = str(tmp_path / "cli_pq.parquet")
    rc = ingest_main([
        "--kind", "local", "--root", str(root),
        "--source-folder-name", "in",
        "--source-file-name", r".*\.parquet$",
        "--format", "parquet",
        "--schema", "id int, name string",
        "--dest", dest,
    ])
    assert rc == 0
    assert spark.read.parquet(dest).count() == 2


def test_ingest_gzipped_csv_over_ftp(spark, tmp_path):
    """Mixed plain + gzipped CSVs ingest in one job: payloads are
    gunzipped executor-side by magic-byte detection (not extension)."""
    import gzip

    from ftp_blueprints_spark.sources.ingest import ingest_csv

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    (root / "in" / "plain.csv").write_text("id,name\n1,ant\n")
    (root / "in" / "zipped.csv.gz").write_bytes(
        gzip.compress(b"id,name\n2,bee\n3,cat\n")
    )
    dest = str(tmp_path / "gz_out.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_csv(
            spark, spec_for(host, port), "in",
            schema="id int, name string", dest=dest,
            pattern=r".*\.csv(\.gz)?$",
        )
    assert n == 3
    names = {r["name"] for r in spark.read.parquet(dest).collect()}
    assert names == {"ant", "bee", "cat"}


def test_ingest_orc_over_ftp(spark, tmp_path):
    """ORC-over-FTP mirrors the parquet path: executor-side fetch,
    pyarrow ORC parse in mapInPandas, lineage + column projection."""
    import pyarrow as pa
    import pyarrow.orc as po

    from ftp_blueprints_spark.sources.ingest import ingest_orc

    root = tmp_path / "srv"
    (root / "in").mkdir(parents=True)
    po.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int32()),
                "text": ["a", "b", "c"],
                "extra": [9.0, 8.0, 7.0],
            }
        ),
        str(root / "in" / "o1.orc"),
    )
    po.write_table(
        pa.table({"id": pa.array([4], pa.int32()), "text": ["d"], "extra": [6.0]}),
        str(root / "in" / "o2.orc"),
    )
    dest = str(tmp_path / "orc_out.parquet")
    with FtpStubServer(str(root), USERS) as (host, port):
        n = ingest_orc(
            spark, spec_for(host, port), "in",
            schema="id int, text string", dest=dest,
        )
    assert n == 4
    out = spark.read.parquet(dest)
    assert sorted(out.columns) == ["id", "row_no", "src_path", "text"]  # extra pruned
    rows = {(r["src_path"], r["row_no"]): r for r in out.collect()}
    assert rows[("in/o1.orc", 3)]["text"] == "c"
    assert rows[("in/o2.orc", 1)]["id"] == 4


# --- regex-prefix traversal pruning (SURVEY §4.2) ----------------------------

def test_pattern_prefix_derivation():
    """Unit contract for the static-prefix parser: ^-anchored literal
    folder runs are extracted up to the last '/', escaped metachars
    count as literals, character classes and unanchored patterns
    disable pruning entirely (rlike is re.search — an unanchored
    pattern may match anywhere)."""
    from ftp_blueprints_spark.sources.listing import pattern_prefix

    assert pattern_prefix(r"^logs/2026-08/.*\.gz") == "logs/2026-08"
    assert pattern_prefix(r"^logs/2026-08/x") == "logs/2026-08"
    assert pattern_prefix(r"^data/sub\-dir/.*") == "data/sub-dir"
    assert pattern_prefix(r"^data/\d+/.*") == "data"
    assert pattern_prefix(r"^(a|b)/c") == ""
    assert pattern_prefix(r"logs/.*\.gz") == ""  # unanchored
    assert pattern_prefix(r"^nofolder.*") == ""
    assert pattern_prefix(r"^exact/path\.txt$") == "exact"
    # top-level alternation: '^a/.*|^b/.*' matches under b/ too, so a
    # prefix from the first alternative would silently drop them
    assert pattern_prefix(r"^a/.*|^b/.*") == ""
    assert pattern_prefix(r"^data/\d+|other") == ""
    assert pattern_prefix(r"^(a|b)/c/.*") == ""  # group breaks the scan
    assert pattern_prefix(r"^logs/(a|b)/.*") == "logs"  # grouped '|' is fine
    assert pattern_prefix(r"^a/\|/b/c") == "a/|/b"  # escaped '|' is a literal
    # quantifier at the break makes the last literal char optional:
    # '^logs/?x' matches root-level 'logsx' outside the logs/ subtree
    assert pattern_prefix(r"^logs/?x") == ""
    assert pattern_prefix(r"^logs/*x") == ""
    assert pattern_prefix(r"^a/b{2,3}/c") == "a"
    assert pattern_prefix(r"^ab/cd*e") == "ab"
    # path-shape guard: a seed the full walk could never reach must not
    # prune — absolute prefixes (manifest paths are root-relative),
    # root-escaping '..', all-dots segments (what F4 skips during
    # traversal), and empty '//' segments
    assert pattern_prefix(r"^/data/sub/.*") == ""
    assert pattern_prefix(r"^\.\./x/.*") == ""
    assert pattern_prefix(r"^\.\.\./x/.*") == ""
    assert pattern_prefix(r"^a//b/.*") == ""
    assert pattern_prefix(r"^a/\.hidden/b/.*") == "a/.hidden/b"  # dot-named dirs ok
    import re

    for pat, victim in [
        (r"^a/.*|^b/.*", "b/file"),
        (r"^logs/?x", "logsx"),
        (r"^logs/*x", "logsx"),
    ]:
        # the soundness property itself: these paths MATCH yet live
        # outside the subtree a naive prefix would prune to
        assert re.search(pat, victim)


def test_seed_for_root_interaction():
    """The pattern prefix is in manifest-path coordinates (the path
    column contains the root), so seeding must reconcile the two:
    below-root prefixes prune, above-root prefixes don't, divergent
    literals prove zero matches without a single listing."""
    from ftp_blueprints_spark.sources.listing import seed_for

    assert seed_for("", "data/sub") == "data/sub"
    assert seed_for("data", "data/sub") == "data/sub"
    assert seed_for("data/sub", "data") == "data/sub"  # ancestor: no prune
    assert seed_for("data", "data") == "data"
    assert seed_for("data", "") == "data"
    assert seed_for("data", "other") is None
    assert seed_for("data", "dat") is None  # not a path-segment prefix


def test_pruned_listing_saves_nlst_calls(spark, ftp_root):
    """A ^-anchored fullpath pattern seeds the BFS at its static folder
    prefix: the pruned walk lists ONE folder where the full walk lists
    the whole tree, and the post-match manifests are identical — the
    generalization of the reference's exact-match pushdown
    (download_file.py:251,282-296)."""
    from ftp_blueprints_spark.operators.manifest import match_files

    pattern = r"^data/sub/.*[.]txt$"

    srv_full = FtpStubServer(ftp_root, USERS)
    with srv_full as (host, port):
        full = list_tree(spark, spec_for(host, port), "")
        full_match = {
            tuple(r) for r in match_files(full, pattern=pattern,
                                          scope="fullpath").collect()
        }
        full_nlst = srv_full.nlst_count

    srv_pruned = FtpStubServer(ftp_root, USERS)
    with srv_pruned as (host, port):
        pruned = list_tree(
            spark, spec_for(host, port), "", path_pattern=pattern
        )
        pruned_match = {
            tuple(r) for r in match_files(pruned, pattern=pattern,
                                          scope="fullpath").collect()
        }
        pruned_nlst = srv_pruned.nlst_count

    assert pruned_match == full_match
    assert len(full_match) == 1  # data/sub/c.txt really matched
    # full walk: root + data + data/sub (dot-dir pruned in traversal);
    # pruned walk: the seed folder only
    assert full_nlst == 3
    assert pruned_nlst == 1


def test_pruned_listing_missing_prefix_is_empty(spark, ftp_root):
    """A prefix folder that doesn't exist is a tree with no matches —
    the same zero-match outcome the full walk reaches (F7 exit-200),
    not an error."""
    with FtpStubServer(ftp_root, USERS) as (host, port):
        mf = list_tree(
            spark, spec_for(host, port), "",
            path_pattern=r"^no/such/folder/.*[.]gz$",
        )
        assert mf.count() == 0


def test_missing_folder_error_discrimination():
    """Only genuinely-missing-folder errors may soften into an empty
    pruned manifest (r9 advice): FTP's 550 covers both missing and
    permission-denied, so the reply text is inspected — a 550 naming a
    permission problem, any non-550 reply (530 auth, 501 syntax), and
    transient errors all propagate."""
    import ftplib

    from ftp_blueprints_spark.sources.connector import is_missing_folder_error

    soften = [
        ftplib.error_perm("550 no such directory"),
        ftplib.error_perm("550 No such file or directory"),
        ftplib.error_perm("550 not a directory"),
        ftplib.error_perm("550 Failed"),  # bare 550: ambiguous, documented
        FileNotFoundError("x"),
        NotADirectoryError("x"),
    ]
    surface = [
        ftplib.error_perm("550 Permission denied"),
        ftplib.error_perm("550 Access is denied."),
        ftplib.error_perm("550 insufficient privileges"),
        ftplib.error_perm("550 /var/data: Operation not permitted"),
        ftplib.error_perm("550 user not authorized"),
        ftplib.error_perm("530 Not logged in"),
        ftplib.error_perm("501 Syntax error"),
        ftplib.error_temp("421 Service not available"),
        TimeoutError("timed out"),
        PermissionError("local ACL"),
    ]
    assert all(is_missing_folder_error(e) for e in soften)
    assert not any(is_missing_folder_error(e) for e in surface)


def test_pruned_listing_permission_denied_raises(spark, ftp_root):
    """A pruned seed probe that hits permission-denied must surface the
    error, not return an empty manifest — softening it would turn an
    ACL misconfiguration into a silent zero-match exit 200."""
    import ftplib

    import pytest as _pytest

    with FtpStubServer(ftp_root, USERS) as (host, port):
        spec = spec_for(host, port)

        class DenyingSpec(type(spec)):
            def connect(self):
                client = super().connect()
                real = client.listdir

                def deny(folder):
                    raise ftplib.error_perm("550 Permission denied")

                client.listdir = deny
                return client

        dspec = DenyingSpec(**{f: getattr(spec, f) for f in spec.__dataclass_fields__})
        with _pytest.raises(ftplib.error_perm):
            list_tree(
                spark, dspec, "", path_pattern=r"^data/sub/.*[.]txt$"
            ).count()


def test_datasource_prunes_partitions_by_pattern(spark, ftp_root):
    """The executor-partitioned DataSource honors the same option: with
    path_pattern, partitions() lists the seed folder instead of the
    root, so the walk covers one subtree; rows equal the pruned
    list_tree manifest."""
    from ftp_blueprints_spark.sources.datasource import ManifestDataSource

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass
    srv = FtpStubServer(ftp_root, USERS)
    with srv as (host, port):
        df = (
            spark.read.format("ftp_manifest")
            .option("kind", "ftp").option("host", host)
            .option("port", str(port))
            .option("username", "alice").option("password", "secret")
            .option("timeout", "10")
            .option("folder", "")
            .option("path_pattern", r"^data/sub/.*[.]txt$")
            .load()
        )
        rows = {r["path"] for r in df.collect()}
        assert rows == {"data/sub/c.txt"}
        # driver partitions() listing + the (empty) subtree walk of the
        # seed's one file partition; never the root or data/ levels
        assert srv.nlst_count <= 2

        missing = (
            spark.read.format("ftp_manifest")
            .option("kind", "ftp").option("host", host)
            .option("port", str(port))
            .option("username", "alice").option("password", "secret")
            .option("timeout", "10")
            .option("folder", "")
            .option("path_pattern", r"^no/such/prefix/.*")
            .load()
        )
        assert missing.count() == 0


def test_pattern_prefix_soundness_property():
    """Property proof of the pruning contract: whenever pattern_prefix
    returns a non-empty prefix, EVERY string the pattern matches
    (re.search — rlike semantics) lies strictly inside the prefix
    subtree (starts with '<prefix>/'). Patterns are composed from the
    fragment grammar below over a tiny alphabet so matches are common;
    the two r9 hand-found holes (top-level alternation, boundary
    quantifiers) fail this property immediately if reintroduced."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ftp_blueprints_spark.sources.listing import pattern_prefix

    fragment = st.sampled_from(
        ["a", "b", "ab", "/", ".", "*", "?", "+", "|", "(", ")",
         "[ab]", "\\.", "\\d", "{1,2}", "$", "a/", "b/", ".*", "/?"]
    )
    paths = st.lists(
        st.sampled_from(["a", "b", "ab", "aa", "ba"]), min_size=1, max_size=4
    ).map("/".join)

    @given(
        body=st.lists(fragment, min_size=1, max_size=8).map("".join),
        candidates=st.lists(paths, min_size=1, max_size=20),
    )
    @settings(max_examples=500, deadline=None)
    def check(body: str, candidates: list[str]) -> None:
        pattern = "^" + body
        try:
            rx = re.compile(pattern)
        except re.error:
            return  # not a valid regex: pattern_prefix output is moot
        prefix = pattern_prefix(pattern)
        if not prefix:
            return  # no pruning claimed, nothing to prove
        for path in candidates:
            if rx.search(path):
                assert path.startswith(prefix + "/"), (
                    f"pattern {pattern!r} matched {path!r} outside the "
                    f"claimed prune subtree {prefix!r}"
                )

    check()
