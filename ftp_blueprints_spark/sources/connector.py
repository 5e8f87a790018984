"""Remote-storage connector interface + implementations.

Spark has no native FTP source, and a single ``ftplib.FTP`` session is
stateful (pwd/cwd) and unshareable across executors. The engine
therefore talks to remote trees through a small picklable interface:

- :class:`ClientSpec` — a picklable *description* of a connection
  (host/port/credentials/policy). Shipped to executors; each partition
  opens its own client (``spec.connect()``) and closes it when done.
- :class:`RemoteClient` — the operation surface the sinks and listing
  source consume: ``listdir / retrieve / store / rename / delete /
  makedirs``.
- :class:`LocalFSClient` — local-filesystem implementation used for
  integration tests and for the reference's local-side operators (S5
  local listing, S11 local dest-folder create).
- :class:`FTPClient` — ``ftplib`` implementation with ONE configurable
  timeout/passive policy, replacing the reference's four inconsistent
  ``get_client`` variants (download_file.py:210-227 sets timeout=300 +
  passive; delete_file.py:89-104 sets timeout=3600 + passive;
  upload/move set neither).

Scale design: sinks call ``spec.connect()`` once per PARTITION (not per
row), and action DataFrames are repartitioned to ``max_connections``
before ``foreachPartition`` so a 1000-executor job cannot open more
sessions than the server allows.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from ..errors import IncorrectCredentials


class RemoteClient:
    """Operation surface over a file tree ('/'-separated paths)."""

    def listdir(self, folder: str) -> list[tuple[str, bool, int | None]]:
        """List direct children of ``folder`` as (path, is_dir, size).
        Returned paths are folder-prefixed (the reference normalizes
        bare names the same way, download_file.py:154-157)."""
        raise NotImplementedError

    def retrieve(self, remote_path: str, fileobj) -> None:
        """Stream remote file bytes into a writable binary fileobj
        (RETR, download_file.py:199)."""
        raise NotImplementedError

    def store(self, fileobj, remote_path: str) -> None:
        """Stream a readable binary fileobj to the remote path
        (STOR, upload_file.py:187)."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Server-side rename/move (move_file.py:109)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Delete a remote file (delete_file.py:81)."""
        raise NotImplementedError

    def makedirs(self, folder: str) -> None:
        """Idempotent mkdir -p, segment by segment (upload_file.py:159-171:
        try cwd, on failure mkd+cwd — safe under concurrent partitions
        because the 'already exists' failure is swallowed)."""
        raise NotImplementedError

    def close(self) -> None:
        pass


class LocalFSClient(RemoteClient):
    """RemoteClient over a local directory root.

    Paths are '/'-relative to ``root``; the same tree semantics as an
    FTP server (no scheme, no drive letters). Used by integration tests
    and by local-side reference operators."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def _abs(self, path: str) -> str:
        return os.path.normpath(os.path.join(self.root, path.lstrip("/")))

    def listdir(self, folder: str):
        base = self._abs(folder)
        out = []
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name)
            rel = f"{folder.rstrip('/')}/{name}" if folder.strip("/") else name
            if os.path.isdir(p):
                out.append((rel, True, None))
            else:
                out.append((rel, False, os.path.getsize(p)))
        return out

    def retrieve(self, remote_path: str, fileobj) -> None:
        with open(self._abs(remote_path), "rb") as f:
            shutil.copyfileobj(f, fileobj)

    def store(self, fileobj, remote_path: str) -> None:
        with open(self._abs(remote_path), "wb") as f:
            shutil.copyfileobj(fileobj, f)

    def rename(self, src: str, dst: str) -> None:
        os.rename(self._abs(src), self._abs(dst))

    def delete(self, path: str) -> None:
        os.remove(self._abs(path))

    def makedirs(self, folder: str) -> None:
        os.makedirs(self._abs(folder), exist_ok=True)


class FTPClient(RemoteClient):
    """``ftplib`` implementation with a single connection policy.

    Listing classifies entries with the reference's cwd-probe
    (download_file.py:159-167): cwd succeeds -> folder, error_perm ->
    file. ``size()`` is used opportunistically for file sizes (the
    size-probe, move_file.py:52-61)."""

    def __init__(self, host, port, username, password, timeout=300, passive=True):
        import ftplib

        try:
            self._ftp = ftplib.FTP(timeout=timeout)
            self._ftp.connect(host, int(port))
            self._ftp.login(username, password)
            self._ftp.set_pasv(passive)
        except Exception as e:  # reference exits 3 here (download_file.py:227)
            raise IncorrectCredentials(str(e)) from e

    def listdir(self, folder: str):
        import ftplib

        original = self._ftp.pwd()
        out = []
        for name in self._ftp.nlst(folder):
            if "/" not in name:  # bare-name servers (download_file.py:154-157)
                # root-level listing keeps bare names (no leading '/') —
                # the same path convention as LocalFSClient.listdir
                name = f"{folder}/{name}" if folder.strip("/") else name
            try:
                self._ftp.cwd(name)
            except ftplib.error_perm:
                size = None
                try:
                    size = self._ftp.size(name)
                except Exception:
                    pass
                out.append((name, False, size))
                continue
            self._ftp.cwd(original)
            out.append((name, True, None))
        return out

    def retrieve(self, remote_path: str, fileobj) -> None:
        self._ftp.retrbinary(f"RETR {remote_path}", fileobj.write)

    def store(self, fileobj, remote_path: str) -> None:
        self._ftp.storbinary(f"STOR {remote_path}", fileobj)

    def rename(self, src: str, dst: str) -> None:
        self._ftp.rename(src, dst)

    def delete(self, path: str) -> None:
        self._ftp.delete(path)

    def makedirs(self, folder: str) -> None:
        original = self._ftp.pwd()
        for seg in folder.split("/"):
            if not seg:
                continue
            try:
                self._ftp.cwd(seg)
            except Exception:
                self._ftp.mkd(seg)
                self._ftp.cwd(seg)
        self._ftp.cwd(original)

    def close(self) -> None:
        try:
            self._ftp.quit()
        except Exception:
            pass


_PERM_MARKERS = (
    "permission", "denied", "access", "privilege", "forbidden",
    # strerror-derived texts: proftpd maps EPERM to "Operation not
    # permitted"; other servers say "not authorized"
    "permitted", "authorized",
)


def is_missing_folder_error(exc: BaseException) -> bool:
    """True iff ``exc`` from a ``listdir`` call means the folder does not
    exist — the only error class the pruned-seed probes may soften into
    an empty manifest (a full walk would never visit a missing prefix
    and would report zero matches, download_file.py:262-266).

    Local clients are unambiguous (FileNotFoundError/NotADirectoryError).
    FTP conflates missing and permission-denied under one reply code:
    RFC 959 gives both "file unavailable (e.g., file not found, no
    access)" as 550.  Discriminate on the reply, conservatively:

    * non-550 5xx replies (530 not-logged-in, 501 syntax, 532, ...) are
      never missing-folder — they propagate;
    * a 550 whose text names a permission problem ("Permission denied",
      "Access is denied", ...) propagates — softening it would turn an
      auth/ACL misconfiguration into a silent "zero matches, exit 200";
    * any other 550 is treated as missing.  A server that replies with a
      bare "550 Failed" for permission-denied is indistinguishable from
      missing over the wire; such prunes soften where the equivalent
      full walk would raise mid-walk.  That residual ambiguity is
      inherent to FTP, not to the pruning."""
    if isinstance(exc, (FileNotFoundError, NotADirectoryError)):
        return True
    import ftplib

    if not isinstance(exc, ftplib.error_perm):
        return False
    text = str(exc)
    if not text.startswith("550"):
        return False
    low = text.lower()
    return not any(m in low for m in _PERM_MARKERS)


@dataclass
class ClientSpec:
    """Picklable connection description; one ``connect()`` per partition.

    ``kind='local'`` needs only ``root``; ``kind='ftp'`` uses
    host/port/credentials plus the unified timeout/passive policy."""

    kind: str = "local"
    root: str = "."
    host: str = ""
    port: int = 21
    username: str = ""
    password: str = field(default="", repr=False)
    timeout: int = 300
    passive: bool = True
    max_connections: int = 16

    def connect(self) -> RemoteClient:
        if self.kind == "local":
            return LocalFSClient(self.root)
        if self.kind == "ftp":
            return FTPClient(
                self.host, self.port, self.username, self.password,
                timeout=self.timeout, passive=self.passive,
            )
        raise ValueError(f"unknown client kind: {self.kind}")
