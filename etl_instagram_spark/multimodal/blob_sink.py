"""Pluggable blob sink (W8): the reference's S3 put of image bytes
(labels.js:31-48, key ``{id}.jpg``) generalized to a per-partition
writer with an injected ``put(key, bytes)`` client.

Default client writes to a local directory (the offline stand-in for an
object store); a boto3/gcs client drops in without touching the operator.
``foreachPartition`` keeps one client per task (connection reuse) and
streams rows — no driver collect, no Arrow round-trip for the bytes.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

PutFn = Callable[[str, bytes], None]


def local_dir_client(root: str) -> PutFn:
    os.makedirs(root, exist_ok=True)

    def put(key: str, content: bytes) -> None:
        path = os.path.join(root, key)
        os.makedirs(os.path.dirname(path) or root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(content)
        os.replace(tmp, path)  # atomic publish, idempotent under retry

    return put


def put_blobs(
    blobs: DataFrame,
    make_client: Callable[[], PutFn],
    id_col: str = "id",
    content_col: str = "content",
    suffix: str = ".jpg",
) -> None:
    """Write every blob as ``{id}{suffix}`` via the injected client.
    ``make_client`` runs once per partition (executor-side) so clients
    are never serialized from the driver."""

    def write_partition(rows) -> None:
        put = make_client()
        for row in rows:
            content = row[content_col]
            if content is not None:
                put(f"{row[id_col]}{suffix}", bytes(content))

    blobs.select(id_col, content_col).foreachPartition(write_partition)
