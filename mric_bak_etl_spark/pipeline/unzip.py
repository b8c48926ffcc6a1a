"""In-cluster zip decompression — the one genuinely custom operator.

Reference behavior (SURVEY.md §2A R9/R10): shell out to ``7z e`` on a
downloaded archive, then scan the temp folder for the entry whose name
contains ``.bak`` (`src/bak_unload.ps1:73-87`). Spark has no codec for
arbitrary zip archives, so this is the engine's only Python stage: a
``mapInPandas`` over the ``binaryFile`` source — each executor decompresses
the archives in its own partition; nothing round-trips through the driver.

Scale notes (100 TB): one archive = one task input row, so archives
parallelize across executors naturally. Entry bytes are materialized per
batch; for multi-GB entries the pattern is the reference's own F:-drive
trick (`src/bak_unload.ps1:13-15`) — stream ``zipfile``'s file handle to
executor-local disk and emit the local path instead of bytes. The bytes
variant below is correct for snapshot-sized payloads and keeps the data in
the DataFrame; both shapes share the same schema contract.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ENTRY_SCHEMA = (
    "archive_path string, entry_name string, entry_size long, entry_bytes binary"
)


def _explode_archives(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            "archive_path": [],
            "entry_name": [],
            "entry_size": [],
            "entry_bytes": [],
        }
        for path, content in zip(pdf["path"], pdf["content"]):
            with zipfile.ZipFile(io.BytesIO(content)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    out["archive_path"].append(path)
                    out["entry_name"].append(info.filename)
                    out["entry_size"].append(info.file_size)
                    out["entry_bytes"].append(zf.read(info))
        yield pd.DataFrame(out)


def unzip_entries(archives: DataFrame) -> DataFrame:
    """R9: archive rows (``path``, ``content``) → one row per zip entry.

    Arrow-batched ``mapInPandas`` (not a row-at-a-time UDF); runs where the
    data lives.
    """
    return archives.select("path", "content").mapInPandas(
        _explode_archives, schema=ENTRY_SCHEMA
    )


def pick_payload(entries: DataFrame, pattern: str = ".bak") -> DataFrame:
    """R10: select the payload entry — name contains ``pattern``.

    The reference's loop keeps the LAST match (`src/bak_unload.ps1:81-87`,
    last-writer-wins); with names sorted that is the lexicographic max, which
    is how we make the choice deterministic and distributed.
    """
    from pyspark.sql import functions as F

    matches = entries.filter(F.col("entry_name").contains(pattern))
    last_name = matches.groupBy("archive_path").agg(
        F.max("entry_name").alias("entry_name")
    )
    return matches.join(last_name, on=["archive_path", "entry_name"], how="left_semi")
