"""Multi-host scaling: file-list sharding + per-host CSV shards.

The reference's only cross-worker aggregation was in-process list/DataFrame
concat (SURVEY.md §2.6). The TPU-native equivalent for the 100k-image sweep
config: every host strides the global file list by ``jax.process_index()``
(DCN never moves image bytes — only the tiny CSV shards are merged at the
end), each host runs the data-parallel pipeline over its local devices, and
host 0 concatenates the per-host CSV shards. Works degenerately on a single
host (process_count == 1).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import pandas as pd

from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def process_info():
    import jax

    return jax.process_index(), jax.process_count()


def shard_file_list(files: Sequence[Path], index: Optional[int] = None,
                    count: Optional[int] = None) -> List[Path]:
    """This host's stride-sharded slice of the global (sorted) file list."""
    if index is None or count is None:
        index, count = process_info()
    files = sorted(files)
    return list(files[index::count])


def shard_csv_path(output_dir: Path, name: str = "cell_metrics",
                   index: Optional[int] = None) -> Path:
    if index is None:
        index, _ = process_info()
    return Path(output_dir) / f"{name}.shard{index:04d}.csv"


def merge_csv_shards(output_dir: Path, name: str = "cell_metrics",
                     remove_shards: bool = False) -> Optional[Path]:
    """Host 0: concatenate ``{name}.shard*.csv`` -> ``{name}.csv``."""
    index, _ = process_info()
    if index != 0:
        return None
    output_dir = Path(output_dir)
    shards = sorted(output_dir.glob(f"{name}.shard*.csv"))
    if not shards:
        return None
    df = pd.concat([pd.read_csv(s) for s in shards], ignore_index=True)
    out = output_dir / f"{name}.csv"
    df.to_csv(out, index=False)
    if remove_shards:
        for s in shards:
            s.unlink()
    logger.info("merged %d shards -> %s (%d rows)", len(shards), out, len(df))
    return out


def run_sharded_directory(pipeline, input_dir: Path, output_dir: Path,
                          save_visualizations: bool = False):
    """Process this host's shard of a directory; write per-host CSV shards.

    Construct ``pipeline`` with ``mesh=make_mesh(...)`` over this host's
    local devices so each host's batch runs data-parallel across its chips
    (two-level parallelism: files sharded over hosts, batches over devices).
    Call :func:`merge_csv_shards` afterwards (host 0) for the global CSVs.
    """
    from ..io.images import list_image_files
    from ..pipeline.results import BatchProcessingResult

    index, count = process_info()
    files = shard_file_list(list_image_files(Path(input_dir), recursive=True))
    logger.info("host %d/%d: %d files in shard", index, count, len(files))
    batch = pipeline.process_directory(
        input_dir, output_dir, save_visualizations=save_visualizations,
        image_paths=files,
    )
    run_dir = Path(output_dir) / pipeline.run_id
    if batch.metrics_data:
        pd.DataFrame(batch.metrics_data).to_csv(
            shard_csv_path(run_dir, "cell_metrics", index), index=False
        )
    if batch.timing_data:
        pd.DataFrame(batch.timing_data).to_csv(
            shard_csv_path(run_dir, "processing_times", index), index=False
        )
    return batch
