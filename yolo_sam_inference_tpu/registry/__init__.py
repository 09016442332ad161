"""Storage / registry layer: work manifests with resume, DB adapters, tracking.

The reference stored per-image results in Postgres JSONB keyed by
``minio_path`` with an ``empty/results/error`` schema, making every image an
idempotent unit of work that a re-run skips (reference
``tools/postgres_data_create.py:68-117``, ``pipelines/inference/nodes.py:23-29``).

Here the same semantics are first-class and dependency-light:

* :mod:`manifest` — the canonical implementation on stdlib sqlite3
  (always available; same table templates, upsert ingestion, summary stats);
* :mod:`postgres` — the Postgres adapter with the same interface
  (requires psycopg2, absent in this environment — import-gated);
* :mod:`tracking` — MLflow experiment tracking hooks (import-gated);
* :mod:`readout` — batch CSV concatenation (local + MinIO-gated).
"""

from .manifest import WorkManifest, TABLE_TEMPLATES

__all__ = ["WorkManifest", "TABLE_TEMPLATES"]
