"""Batch CSV readout: concatenate per-batch tables into one combined CSV.

Capability parity with reference ``tools/local_mib_batch_readout.py`` (local
filesystem) and ``tools/mib_batch_readout.py`` (MinIO bucket, 10-thread
fetch, re-upload of the combined result — MinIO import-gated here).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional

import pandas as pd

from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def combine_local_batches(
    root: Path,
    pattern: str = "batch_*/batch_data.csv",
    output: Optional[Path] = None,
    num_workers: int = 10,
) -> pd.DataFrame:
    """Concatenate ``batch_*/batch_data.csv`` under ``root``; write
    ``combined_output.csv`` (reference ``local_mib_batch_readout.py:89-140``)."""
    root = Path(root)
    files = sorted(root.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no files matching {pattern} under {root}")

    def read(p: Path):
        try:
            df = pd.read_csv(p)
            df["batch"] = p.parent.name
            return df
        except (OSError, pd.errors.ParserError) as e:
            logger.warning("skipping %s: %s", p, e)
            return None

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        frames = [df for df in pool.map(read, files) if df is not None]
    combined = pd.concat(frames, ignore_index=True)
    out = Path(output) if output else root / "combined_output.csv"
    combined.to_csv(out, index=False)
    logger.info("combined %d batch files -> %s (%d rows)", len(frames), out, len(combined))
    return combined


def combine_minio_batches(
    bucket: str = "erb-g07",
    prefix: str = "",
    pattern_name: str = "batch_data.csv",
    endpoint: Optional[str] = None,
    num_workers: int = 10,
    upload: bool = True,
) -> pd.DataFrame:
    """MinIO-backed variant (reference ``mib_batch_readout.py:90-164``).

    Requires the ``minio`` package (absent in this environment — gated).
    """
    import io
    import os

    try:
        from minio import Minio  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "minio is not installed; use combine_local_batches for filesystem runs"
        ) from e

    client = Minio(
        endpoint or os.environ.get("MINIO_ENDPOINT", "localhost:9000"),
        access_key=os.environ.get("MINIO_ACCESS_KEY"),
        secret_key=os.environ.get("MINIO_SECRET_KEY"),
        secure=os.environ.get("MINIO_SECURE", "false").lower() == "true",
    )
    objects = [
        o.object_name
        for o in client.list_objects(bucket, prefix=prefix, recursive=True)
        if o.object_name.endswith(pattern_name)
    ]

    def fetch(name: str):
        resp = client.get_object(bucket, name)
        try:
            df = pd.read_csv(io.BytesIO(resp.read()))
            df["batch"] = name.rsplit("/", 2)[-2]
            return df
        finally:
            resp.close()

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        frames = list(pool.map(fetch, objects))
    combined = pd.concat(frames, ignore_index=True)
    if upload:
        buf = io.BytesIO()
        combined.to_csv(buf, index=False)
        buf.seek(0)
        client.put_object(
            bucket, f"{prefix.rstrip('/')}/combined_output.csv", buf, len(buf.getvalue())
        )
    return combined
