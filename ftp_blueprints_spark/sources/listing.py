"""Listing sources: materialize a real file tree as the manifest
DataFrame (SURVEY.md §2A S2-S5).

    path STRING, folder STRING, name STRING, is_dir BOOLEAN, size LONG

The reference walks the tree sequentially — BFS queue in
download_file.py:252-257 / delete_file.py:121-126, recursive DFS in
move_file.py:63-78 — paying >=1 network round-trip per directory entry
on one connection. Here each BFS *level* is expanded in parallel:
the current frontier of folders is parallelized across partitions and
each partition lists its folders with its own client
(``mapPartitions`` + per-partition ``spec.connect()``). Wall-clock per
level is max(folder listing) instead of sum, and the fan-out is
bounded by ``spec.max_connections`` so a wide tree cannot exceed the
server's session limit. Level results accumulate driver-side as plain
rows ONLY while the tree is small: past ``driver_rows_threshold``
entries the walk abandons driver accumulation and returns the
``ftp_manifest`` DataSource DataFrame instead (datasource.py), whose
per-top-level-entry partitions are walked executor-side — driver
memory stays O(threshold) no matter how many files the tree holds.

S5 (local recursive listing, upload_file.py:136-144) additionally maps
onto Spark's native file source: ``binary_manifest`` uses
``binaryFile`` + recursiveFileLookup/pathGlobFilter, which pushes the
glob into the distributed file-listing layer and prunes the content
column when only metadata is selected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import paths as P
from .connector import ClientSpec, is_missing_folder_error

MANIFEST_SCHEMA = "path string, folder string, name string, is_dir boolean, size bigint"

# Above this many manifest entries, list_tree stops accumulating rows on
# the driver and delegates to the executor-partitioned DataSource walk.
DRIVER_ROWS_THRESHOLD = 100_000

_REGEX_META = set(".^$*+?{}[]|()")


def pattern_prefix(pattern: str) -> str:
    """Static folder prefix of a ^-anchored path regex — SURVEY §4.2's
    below-source traversal pruning; the reference's exact-match branch
    (download_file.py:251,282-296) is the fully-literal degenerate form.

    Returns the longest literal prefix cut at its last '/', or '' when
    the pattern is unanchored (rlike has re.search semantics — an
    unanchored pattern may match anywhere, so no subtree can be safely
    excluded) or has no static folder component.  Sound to seed a
    traversal at: the literal run continues past the returned prefix
    with '/' (or more characters after it), so every matching path
    starts with '<prefix>/' — entries outside that subtree, including
    the seed folder row itself and its ancestors, can never match a
    fullpath-scoped filter.  Basename-scoped patterns (F1) anchor to
    the NAME, not the path: never pass them here.

    Three soundness guards beyond the literal scan (the third is the
    path-shape check at the end — absolute, '..'/all-dots, or
    empty-segment prefixes have no full-walk spelling): a TOP-LEVEL
    unparenthesized '|' disables pruning entirely (alternation has
    lowest precedence, so '^a/.*|^b/.*' matches under b/ even though
    the literal scan would return 'a'; a '|' inside a group is fine —
    the literal prefix before the group still anchors every
    alternative), and a quantifier at the break position ('?', '*',
    '+', '{') drops the last literal character before the cut (in
    '^logs/?x' the '/' is optional, so root-level 'logsx' matches
    outside the logs/ subtree — the prefix must come from 'logs',
    which holds no '/', i.e. no pruning)."""
    if not pattern.startswith("^"):
        return ""
    if _has_toplevel_alternation(pattern):
        return ""
    lit: list[str] = []
    i = 1
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
            if nxt and not nxt.isalnum():
                lit.append(nxt)  # escaped metachar is a literal
                i += 2
                continue
            break  # \d, \w, \S, ... — a character class
        if c in _REGEX_META:
            if c in "?*+{" and lit:
                lit.pop()  # quantifier makes the last literal optional/repeated
            break
        lit.append(c)
        i += 1
    s = "".join(lit)
    prefix = s[: s.rfind("/")] if "/" in s else ""
    # Path-shape guard: the seed must be a path the FULL walk could
    # reach, or pruning breaks the pruned == full+filter equivalence.
    # Manifest paths are root-relative with no leading '/', so an
    # absolute prefix ('^/data/...') never matches a full-walk row;
    # '..' (any all-dots segment) would let LocalFSClient._abs escape
    # the client root, and all-dots segments are also exactly what
    # skip_dot_dirs prunes DURING traversal (F4) — a seed inside one
    # would resurrect a subtree the full walk never visits. Empty
    # segments ('//') have no full-walk spelling either.
    if prefix and any(
        not seg or set(seg) == {"."} for seg in prefix.split("/")
    ):
        return ""
    return prefix


def _has_toplevel_alternation(pattern: str) -> bool:
    """True when an unescaped '|' sits at paren depth 0 outside a
    character class — the one regex structure under which a literal
    prefix of the FIRST alternative says nothing about the others."""
    depth, in_class, i = 0, False, 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            in_class = c != "]"
        elif c == "[":
            in_class = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return True
        i += 1
    return False


def seed_for(root: str, prefix: str) -> str | None:
    """Effective traversal seed for a walk rooted at ``root`` given a
    pattern's static folder prefix (both in manifest-path coordinates —
    the ``path`` column contains the root).  ``None`` means no path
    under ``root`` can match at all (divergent literals), so the walk
    can be skipped entirely."""
    if not prefix or prefix == root:
        return root
    if not root:
        return prefix
    if prefix.startswith(root + "/"):
        return prefix  # pattern pins a subtree strictly below root
    if root.startswith(prefix + "/"):
        return root  # literal runs out above root: no pruning possible
    return None


def _datasource_tree(
    spark: SparkSession, spec: ClientSpec, root: str, skip_dot_dirs: bool
) -> DataFrame:
    """The scale path: ``ftp_manifest`` DataSource (sources/datasource.py)
    — one root-level listing on the driver, every top-level entry's
    subtree walked executor-side with its own client. Nothing
    proportional to file count ever lives in driver memory."""
    from .datasource import ManifestDataSource, _spec_options

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("ftp_manifest")
        .options(**_spec_options(spec))
        .option("folder", root)
        .option("skip_dot_dirs", "true" if skip_dot_dirs else "false")
        .load()
    )


def _list_level(spec: ClientSpec, folders: list[str]) -> list[tuple]:
    """List one frontier of folders with a single client (executor-side)."""
    client = spec.connect()
    try:
        rows = []
        for folder in folders:
            for path, is_dir, size in client.listdir(folder):
                name = path.rsplit("/", 1)[-1]
                rows.append((path, folder, name, is_dir, size))
        return rows
    finally:
        client.close()


def list_tree(
    spark: SparkSession,
    spec: ClientSpec,
    root: str = "",
    skip_dot_dirs: bool = True,
    max_depth: int = 64,
    driver_rows_threshold: int = DRIVER_ROWS_THRESHOLD,
    path_pattern: str | None = None,
) -> DataFrame:
    """BFS the tree under ``root`` into a manifest DataFrame (S2+S3).

    Dot-directories are skipped during traversal when requested —
    download's behavior (download_file.py:150-152); delete does NOT
    skip them (delete_file.py:45-73), hence the flag.

    ``path_pattern`` (a FULLPATH-scoped match regex, F2 semantics)
    enables regex-prefix traversal pruning: the BFS is seeded at the
    pattern's static folder prefix (:func:`pattern_prefix`) instead of
    ``root``, so ``^logs/2026-08/.*\\.gz`` lists one month's subtree
    instead of walking the whole server.  The resulting manifest holds
    exactly the seed's subtree — everything a fullpath match of the
    pattern could select; a missing seed folder yields an empty
    manifest (the same zero-match outcome the full walk would reach,
    F7 exit-200).  Never pass a basename-scoped (F1) pattern.

    Driver memory is bounded: once the accumulated manifest crosses
    ``driver_rows_threshold`` rows the walk hands off to the
    executor-partitioned DataSource (the partial BFS work is discarded —
    crossing the threshold means the tree is big enough that a clean
    distributed walk beats finishing a driver-side one)."""
    sc = spark.sparkContext
    seed = root
    if path_pattern:
        seed = seed_for(root, pattern_prefix(path_pattern))
        if seed is None:  # literals diverge: nothing under root matches
            return spark.createDataFrame([], MANIFEST_SCHEMA)
    frontier = [seed]
    all_rows: list[tuple] = []
    if seed != root:
        # pruned entry: one driver-side listing doubles as the seed
        # probe — a prefix folder that doesn't exist is simply a tree
        # with no matches, not an error (the full walk would never
        # visit it and report zero matches). ONLY missing-folder
        # errors soften (is_missing_folder_error inspects the 550
        # reply text so permission-denied propagates); transient
        # failures (timeouts, 421s) surface exactly as they would
        # mid-walk.
        client = spec.connect()
        try:
            try:
                level0 = client.listdir(seed)
            except Exception as e:
                if not is_missing_folder_error(e):
                    raise
                return spark.createDataFrame([], MANIFEST_SCHEMA)
        finally:
            client.close()
        frontier = []
        for path, is_dir, size in level0:
            name = path.rsplit("/", 1)[-1]
            if skip_dot_dirs and set(name) == {"."}:
                continue
            all_rows.append((path, seed, name, is_dir, size))
            if is_dir:
                frontier.append(path)
    for _ in range(max_depth):
        if not frontier:
            break
        if len(all_rows) > driver_rows_threshold:
            return _datasource_tree(spark, spec, seed, skip_dot_dirs)
        n_parts = max(1, min(len(frontier), spec.max_connections))
        level = (
            sc.parallelize(frontier, n_parts)
            .mapPartitions(lambda it, s=spec: _list_level(s, list(it)))
            .collect()
        )
        frontier = []
        for path, folder, name, is_dir, size in level:
            if skip_dot_dirs and set(name) == {"."}:
                continue  # F4 (download_file.py:58-62)
            all_rows.append((path, folder, name, is_dir, size))
            if is_dir:
                frontier.append(path)
    return spark.createDataFrame(all_rows, MANIFEST_SCHEMA)


def binary_manifest(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S5: local/DFS recursive listing through Spark's binaryFile source.

    The glob is pushed into file listing (pathGlobFilter) and `content`
    is pruned unless selected — metadata-only scans never read bytes.
    Paths are normalized to scheme-less '/'-paths to match the manifest
    produced by :func:`list_tree`."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    path = F.regexp_replace(F.col("path"), "^file:", "")
    return df.select(
        path.alias("path"),
        F.regexp_replace(path, "/[^/]*$", "").alias("folder"),
        P.basename(path).alias("name"),
        F.lit(False).alias("is_dir"),
        F.col("length").alias("size"),
    )
