"""Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) exposing
remote trees as DataFrames: the engine's answer to "Spark has no
native FTP source" (SURVEY.md §1.3).

    spark.dataSource.register(ManifestDataSource)
    df = (spark.read.format("ftp_manifest")
          .option("kind", "local").option("root", "/data")
          .option("with_content", "true")
          .load())

Schema: the manifest columns (path/folder/name/is_dir/size), plus a
``content`` BINARY column when ``with_content`` is set.

Partitioning: the driver lists ONLY the root level with one
connection; every top-level entry becomes an InputPartition whose
subtree is walked by an executor with its own client. Listing and
byte-transfer both scale with the number of top-level entries
(bounded by ``max_connections`` at the sink side; readers are capped
by Spark's task parallelism), and file bytes stream executor-side —
they never pass through the driver.

The reader consumes the same ClientSpec/RemoteClient interface as the
sinks, so `kind=ftp` serves a real FTP server with the unified
timeout/passive policy while tests exercise `kind=local`.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .connector import ClientSpec

_BASE_FIELDS = [
    StructField("path", StringType()),
    StructField("folder", StringType()),
    StructField("name", StringType()),
    StructField("is_dir", BooleanType()),
    StructField("size", LongType()),
]


def _spec_from_options(options) -> ClientSpec:
    return ClientSpec(
        kind=options.get("kind", "local"),
        root=options.get("root", "."),
        host=options.get("host", ""),
        port=int(options.get("port", 21)),
        username=options.get("username", ""),
        password=options.get("password", ""),
        timeout=int(options.get("timeout", 300)),
        # forward the FULL connection policy: dropping passive here made
        # an active-mode spec silently flip to passive whenever work
        # routed through the DataSource (options are the only channel
        # into executor-side connect())
        passive=options.get("passive", "true") == "true",
        max_connections=int(options.get("max_connections", 16)),
    )


def _spec_options(spec: ClientSpec) -> dict[str, str]:
    """The inverse: every ClientSpec field as DataSource options, so
    reader construction sites cannot silently drop one."""
    return {
        "kind": spec.kind,
        "root": spec.root,
        "host": spec.host,
        "port": str(spec.port),
        "username": spec.username,
        "password": spec.password,
        "timeout": str(spec.timeout),
        "passive": "true" if spec.passive else "false",
        "max_connections": str(spec.max_connections),
    }


class _TreePartition(InputPartition):
    def __init__(self, entry: tuple, is_dir: bool):
        self.entry = entry  # (path, folder, name, is_dir, size)
        self.is_dir = is_dir


class ManifestReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.spec = _spec_from_options(options)
        self.root = options.get("folder", "")
        self.skip_dot_dirs = options.get("skip_dot_dirs", "true") == "true"
        self.with_content = options.get("with_content", "false") == "true"
        # regex-prefix traversal pruning (SURVEY §4.2): a FULLPATH-scoped
        # ^-anchored pattern seeds the partition listing at its static
        # folder prefix, so the executor walk covers one subtree instead
        # of the whole server. Never pass a basename-scoped pattern.
        pat = options.get("path_pattern", "") or ""
        self._pruned = False
        self._no_match = False
        if pat:
            from .listing import pattern_prefix, seed_for

            seed = seed_for(self.root, pattern_prefix(pat))
            if seed is None:  # divergent literals: nothing can match
                self._no_match = True
            elif seed != self.root:
                self.root = seed
                self._pruned = True

    def partitions(self):
        """One cheap root-level listing on the driver; each entry's
        subtree becomes an executor-side partition.  A missing root —
        e.g. a pruned prefix folder that doesn't exist — is a tree with
        no matches (the reference reports zero matches, not an error,
        for an unmatched traversal), so it yields the empty partition."""
        if self._no_match:
            return [_TreePartition(None, False)]
        from .connector import is_missing_folder_error

        client = self.spec.connect()
        try:
            try:
                entries = client.listdir(self.root)
            except Exception as e:
                if not self._pruned or not is_missing_folder_error(e):
                    raise  # bad real root / permission-denied / transient
                # a pruned prefix folder that doesn't exist is a tree
                # with no matches (550 reply text inspected so
                # permission-denied propagates, connector.py)
                return [_TreePartition(None, False)]
            parts = []
            for path, is_dir, size in entries:
                name = path.rsplit("/", 1)[-1]
                if self.skip_dot_dirs and set(name) == {"."}:
                    continue
                parts.append(
                    _TreePartition((path, self.root, name, is_dir, size), is_dir)
                )
            return parts or [_TreePartition(None, False)]
        finally:
            client.close()

    def read(self, partition: _TreePartition) -> Iterator[tuple]:
        if partition.entry is None:
            return
        client = self.spec.connect()
        try:
            stack = [partition.entry]
            while stack:
                row = stack.pop()
                path, folder, name, is_dir, size = row
                if is_dir:
                    yield self._emit(row, None)
                    for cpath, c_is_dir, csize in client.listdir(path):
                        cname = cpath.rsplit("/", 1)[-1]
                        if self.skip_dot_dirs and set(cname) == {"."}:
                            continue
                        stack.append((cpath, path, cname, c_is_dir, csize))
                else:
                    content = None
                    if self.with_content:
                        import io

                        buf = io.BytesIO()
                        client.retrieve(path, buf)
                        content = buf.getvalue()
                    yield self._emit(row, content)
        finally:
            client.close()

    def _emit(self, row: tuple, content: bytes | None):
        if self.with_content:
            return (*row, content)
        return row


class ManifestDataSource(DataSource):
    """``ftp_manifest`` format: remote-tree manifest (optionally with
    file bytes) as a DataFrame."""

    @classmethod
    def name(cls) -> str:
        return "ftp_manifest"

    def schema(self) -> StructType:
        fields = list(_BASE_FIELDS)
        if self.options.get("with_content", "false") == "true":
            fields.append(StructField("content", BinaryType()))
        return StructType(fields)

    def reader(self, schema: StructType) -> ManifestReader:
        return ManifestReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ManifestWriter":
        return ManifestWriter(self.options)


class _UploadCommit(WriterCommitMessage):
    def __init__(self, n_files: int):
        self.n_files = n_files


class ManifestWriter(DataSourceWriter):
    """Write side of ``ftp_manifest``: each task uploads its partition's
    rows (``dest_path`` STRING + ``content`` BINARY) through its own
    connection — the DataFrame-native statement of the upload sink
    (operators/actions.upload is the imperative foreachPartition twin).

    Same durability discipline as the download sink: bytes land under a
    temp name and are renamed into place, so a killed task never leaves
    a half-written remote file; parent dirs are mkdir-p'd once per
    partition (memoized). Commit messages carry per-task upload counts;
    a failed task raises and Spark retries it wholesale. Retries are
    made genuinely idempotent by a best-effort delete of the
    destination before the rename — RFC 959 RNTO replies 550 on many
    servers when the target exists (only local os.rename is guaranteed
    to overwrite), so a retry after a partially-committed task would
    otherwise fail permanently. A failed store/rename likewise
    best-effort deletes its temp name so ``*.__uploading__`` litter is
    not left on the remote (task-side cleanup: DataSourceWriter.abort
    only receives commit messages from SUCCESSFUL tasks, so the failing
    task itself is the only place that knows the temp name)."""

    def __init__(self, options):
        self.spec = _spec_from_options(options)

    def write(self, iterator) -> "_UploadCommit":
        import io

        client = self.spec.connect()
        made: set[str] = set()
        n = 0
        try:
            for row in iterator:
                dest = row["dest_path"]
                payload = bytes(row["content"])
                folder = dest.rsplit("/", 1)[0] if "/" in dest else ""
                if folder and folder not in made:
                    client.makedirs(folder)
                    made.add(folder)
                tmp = f"{dest}.__uploading__"
                try:
                    client.store(io.BytesIO(payload), tmp)
                    try:  # RNTO fails on existing dest on many servers
                        client.delete(dest)
                    except Exception:
                        pass
                    client.rename(tmp, dest)
                except Exception:
                    try:  # don't leave temp litter behind a failed task
                        client.delete(tmp)
                    except Exception:
                        pass
                    raise
                n += 1
        finally:
            client.close()
        return _UploadCommit(n)

    def commit(self, messages) -> None:
        total = sum(m.n_files for m in messages if m is not None)
        import logging

        logging.getLogger(__name__).info(
            "ftp_manifest write committed: %d file(s)", total
        )

    def abort(self, messages) -> None:  # best-effort: temp names never
        pass  # became visible, so there is nothing durable to undo
