"""Storage path abstraction (S13).

The reference wraps local / file:// / http(s):// / s3:// behind
C3dcFileManager (file_manager/c3dc_file_manager.py:174-288). On Spark,
the Hadoop filesystem layer already speaks most of these; this module
just normalizes URL schemes to what a Spark reader accepts.
"""

from __future__ import annotations

from urllib.parse import urlparse


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
            "(Spark readers cannot scan HTTP); see sources.config.fetch_json "
            "for driver-side config fetches."
        )
    return path
