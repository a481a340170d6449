"""Storage path abstraction (S13).

The reference wraps local / file:// / http(s):// / s3:// behind
C3dcFileManager (file_manager/c3dc_file_manager.py:174-288). On Spark,
the Hadoop filesystem layer already speaks most of these; this module
just normalizes URL schemes to what a Spark reader accepts.
"""

from __future__ import annotations

from urllib.parse import urlparse
from urllib.request import urlopen

# Config artifacts (mappings, schemas, workbooks) are megabytes; a
# download this large is a mis-pointed URL, not a config file. Mirrors
# the reference's download-size guard
# (file_manager/c3dc_file_manager.py:245-246).
DEFAULT_MAX_FETCH_BYTES = 256 * 1024 * 1024


def normalize_path(path: str) -> str:
    """Map a reference-style location to a Spark-readable path:

    - ``s3://``  -> ``s3a://`` (Hadoop's S3 connector scheme)
    - ``file://`` kept (Hadoop understands it)
    - bare local paths kept
    - ``http(s)://`` rejected with guidance — Spark cannot scan HTTP;
      the reference stages such files to a temp copy
      (etl/ccdi/c3dc_etl.py:374-413), which a caller should do
      explicitly via fetch + local path.
    """
    scheme = urlparse(path).scheme
    if scheme == "s3":
        return "s3a://" + path[len("s3://"):]
    if scheme in ("http", "https"):
        raise ValueError(
            "HTTP(S) sources must be staged to a local/S3 path first "
            "(Spark readers cannot scan HTTP); see sources.storage."
            "stage_to_local / sources.config.fetch_json for driver-side "
            "fetches."
        )
    return path


def stage_to_local(
    url: str,
    dest_path: str,
    *,
    max_bytes: int = DEFAULT_MAX_FETCH_BYTES,
    timeout: float = 60.0,
) -> int:
    """Stage an http(s):// / file:// config artifact to a local path so
    a Spark reader (or the workbook codec) can scan it — the reference's
    temp-copy pattern (etl/ccdi/c3dc_etl.py:374-413) with its download
    size guard: the declared Content-Length is checked up front and the
    stream is re-checked while copying (a server may omit or understate
    the header). Returns bytes written; raises ValueError when the
    artifact exceeds ``max_bytes``.

    The download lands in a temp file beside ``dest_path`` and is
    ``os.replace``d onto it only after the size-checked copy completes:
    a pre-existing artifact is never truncated up front, a concurrent
    glob can never observe a partial file at ``dest_path``, and on any
    failure the original (possibly valid) artifact survives."""
    import os
    import tempfile

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310
        declared = resp.headers.get("Content-Length") if resp.headers else None
        if declared and int(declared) > max_bytes:
            raise ValueError(
                f"{url}: declared size {declared} exceeds limit {max_bytes}"
            )
        written = 0
        fd, tmp_path = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(dest_path)),
            prefix=os.path.basename(dest_path) + ".",
            suffix=".staging",
        )
        try:
            with os.fdopen(fd, "wb") as out:
                while chunk := resp.read(1 << 20):
                    written += len(chunk)
                    if written > max_bytes:
                        raise ValueError(
                            f"{url}: download exceeded limit {max_bytes} bytes"
                        )
                    out.write(chunk)
            os.replace(tmp_path, dest_path)
        except BaseException:
            # never leave a staging file behind; dest_path is untouched
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            raise
    return written
