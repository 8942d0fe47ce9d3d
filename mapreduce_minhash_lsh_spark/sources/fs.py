"""Hadoop FileSystem helpers shared by every store-path probe.

``os.path`` probes are always False (and ``shutil`` deletes are silent
no-ops) for non-local store URIs — s3a://, hdfs://, abfs://, the actual
deployment targets of every durable store in this repo (band store,
bucketed warehouse tables, streaming state dirs).  A silently-False
existence probe is worse than an error: the caller re-initializes state
that already exists (re-splitting a streaming source out from under a
committed checkpoint, overwriting a band store's _spec guard).  All
existence/delete decisions therefore go through the JVM FileSystem API,
resolved against the path's own scheme (VERDICT r9 #5; pattern
originally from operators/bandstore.py and operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_path_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return hpath, fs


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on ITS OWN filesystem (scheme-resolved:
    file://, s3a://, hdfs://, ...) — the store-safe replacement for
    ``os.path.exists``."""
    hpath, fs = _hadoop_path_fs(spark, path)
    return bool(fs.exists(hpath))


def fs_delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete ``path`` on its own filesystem; False when it did not
    exist.  The store-safe replacement for ``shutil.rmtree`` on paths
    that may live off-box."""
    hpath, fs = _hadoop_path_fs(spark, path)
    return bool(fs.delete(hpath, recursive))


def fs_write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file (manifests, specs) through the
    scheme-resolved FileSystem API — works on hdfs://s3a:// store paths
    where a plain open() would write to a local path that doesn't
    exist.  Overwrites."""
    hpath, fs = _hadoop_path_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file written by :func:`fs_write_text`."""
    hpath, fs = _hadoop_path_fs(spark, path)
    stream = fs.open(hpath)
    try:
        jvm = spark.sparkContext._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst`` on src's own filesystem — the
    store-safe replacement for ``os.rename``.  Atomic on HDFS and local
    filesystems; on object stores (s3a://) it is a copy+delete, so
    callers doing swap commits must document the non-atomic window
    (upsert_parquet already does).  Raises when the filesystem refuses
    the rename (e.g. dst exists on a store that won't clobber)."""
    hsrc, fs = _hadoop_path_fs(spark, src)
    jvm = spark.sparkContext._jvm
    hdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"filesystem rename failed: {src} -> {dst}")


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Names (last path component) of ``path``'s direct children on its
    own filesystem; empty when the path does not exist.  The store-safe
    replacement for ``os.listdir`` (used for checkpoint commit probes
    and partition counting on state dirs that may live off-box)."""
    hpath, fs = _hadoop_path_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def fs_join(base: str, *parts: str) -> str:
    """Scheme-safe path composition — the replacement for
    ``os.path.join`` on paths that may be store URIs (VERDICT r11 #6).
    ``os.path.join`` mangles both cases that matter here: on Windows it
    inserts backslashes into what must stay a URI, and a part that
    starts with '/' silently DISCARDS the base (and with it an
    s3a://bucket authority).  This join is pure string assembly with
    '/' — never resolving, never dropping the base — which is exactly
    what Hadoop's Path(parent, child) does for relative children."""
    out = base.rstrip("/")
    for p in parts:
        p = str(p).strip("/")
        if p:
            out = f"{out}/{p}"
    return out


# --- session-scoped local scratch -----------------------------------------
# One scratch ROOT per Spark application, cleaned at interpreter exit —
# the fix for the per-build mkdtemp leak (ADVICE r11: _ivfpq_session_index
# left ivfpq_codes_* directories behind on every new session against the
# same box).  Deterministic path => a crashed run's leftovers are
# reclaimed by the next run's overwrite instead of accumulating.
_SCRATCH_CLEANUP_REGISTERED: set[str] = set()


def scratch_dir(spark: SparkSession, *tag: str) -> str:
    """Local scratch directory scoped to this Spark application:
    ``$TMPDIR/mmlsh-scratch-<applicationId>/<tag...>``.  Created on
    first use; the whole per-application root is rmtree'd at
    interpreter exit (best effort).  For DRIVER-LOCAL intermediate
    artifacts only (memoized index parquet, test fixtures) — durable
    stores take caller-supplied (possibly remote) paths instead."""
    import atexit
    import os
    import shutil
    import tempfile

    import stat

    app = spark.sparkContext.applicationId
    root = os.path.join(tempfile.gettempdir(), f"mmlsh-scratch-{app}")
    # The path is predictable, so on a shared host another user could
    # pre-create (or symlink away) the root and read/redirect the
    # memoized index parquet (ADVICE r12).  Create it 0700 and verify
    # via lstat that it is a real directory we own with no group/other
    # access before trusting it.
    try:
        os.mkdir(root, mode=0o700)
    except FileExistsError:
        pass
    st = os.lstat(root)
    if (
        not stat.S_ISDIR(st.st_mode)  # symlink or non-dir squatting
        or st.st_uid != os.getuid()
        or (st.st_mode & 0o077)
    ):
        raise RuntimeError(
            f"scratch root {root} is not a private directory owned by "
            f"uid {os.getuid()} (mode {oct(st.st_mode)}, uid {st.st_uid})"
            " — refusing to use a pre-existing/foreign scratch path"
        )
    if app not in _SCRATCH_CLEANUP_REGISTERED:
        _SCRATCH_CLEANUP_REGISTERED.add(app)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = os.path.join(root, *tag) if tag else root
    os.makedirs(path, exist_ok=True)
    return path
