"""miru_ray — a Ray-Data-native full-text index + BM25 query engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference (davidbrownjive/miru, a bitmap stream engine — see SURVEY.md).
Everything here is built on public Ray Data / PyArrow APIs:

- index build = ``ray.data.Dataset`` pipeline (map_batches over zero-copy
  Arrow → salted groupby shuffle → per-(partition, shard) segment encode)
- query = actor-pool segment readers + driver top-k heap merge
- broader operator surface (dedup / similarity / text analysis / analytics)
  under :mod:`miru_ray.ops`.
"""

__version__ = "0.1.0"

# Ship this package's functions/classes to Ray workers BY VALUE so pipelines
# work regardless of the driver's cwd / the workers' sys.path (the driver
# that imports __ray_entry__ may not run from the repo root).  Costs a few KB
# per task submission; removes the "No module named miru_ray" failure mode.
try:  # pragma: no cover
    import sys as _sys

    import ray.cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 — best-effort; repo-root drivers still work
    pass

# Ray's schema-dedup fast path logs "Failed to hash the schemas (for
# deduplication): unhashable type: 'dict'" for every pipeline over the
# testdata parquet (whose field metadata defeats pa.Schema.__hash__).  The
# input files are read-only and the warning is benign (Ray falls through to
# the full unify), but it drowns real warnings in every bench/oracle tail —
# drop exactly that record, nothing else, worker-side too (this module is
# imported on every worker via pickle-by-value).
try:  # pragma: no cover
    import logging as _logging

    class _DropSchemaHashNoise(_logging.Filter):
        def filter(self, record: _logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    _logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashNoise())
except Exception:  # noqa: BLE001
    pass
