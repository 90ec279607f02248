"""Dataset IO helpers.

The production input format per BASELINE.json's input_hint is Lance
(``ray.data.read_lance``); this container has no ``lance`` package, so the
reader is gated behind an import-try with parquet as the test-scale path.
Writers emit partition-keyed layouts for resumability
(:mod:`mdvalidate_ray.pipelines.checkpoint`).
"""

from __future__ import annotations


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(path: str, *, columns=None, **kw):
    """Read a documents table: ``.lance`` dataset when the lance package is
    available, parquet file/directory otherwise."""
    import ray.data

    if path.endswith(".lance") or path.endswith(".lance/"):
        if not have_lance():
            raise ImportError(
                "lance is not installed in this environment; convert the "
                "dataset to parquet or install pylance")
        return ray.data.read_lance(path, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)


def write_documents(ds, path: str, *, fmt: str = "parquet", **kw):
    if fmt == "lance":
        if not have_lance():
            raise ImportError("lance is not installed in this environment")
        return ds.write_lance(path, **kw)
    return ds.write_parquet(path, **kw)


def read_documents_jsonl(path: str, *, schema=None, **kw):
    """Read a JSONL (one JSON object per line) corpus — the most common
    raw-crawl interchange format — as a Dataset.  Thin wrapper over
    ``ray.data.read_json`` (arrow JSON reader per block, splittable,
    streaming); pass ``schema`` (a pyarrow schema) to pin column types
    instead of per-file inference (at fleet scale two files must never
    disagree on a column type)."""
    import ray.data

    if schema is not None:
        import pyarrow.json as pj

        kw.setdefault(
            "parse_options",
            pj.ParseOptions(explicit_schema=schema,
                            unexpected_field_behavior="ignore"))
    return ray.data.read_json(path, **kw)


def write_documents_jsonl(ds, path: str, **kw):
    """Write a Dataset as partitioned JSONL (one file per block)."""
    return ds.write_json(path, **kw)


def read_documents_csv(path: str, *, schema=None, **kw):
    """Read a CSV corpus as a Dataset (``ray.data.read_csv``; arrow CSV
    reader, block-splittable).  Pass ``schema`` to pin column types
    instead of per-file inference."""
    import ray.data

    if schema is not None:
        import pyarrow.csv as pcsv

        kw.setdefault(
            "convert_options",
            pcsv.ConvertOptions(column_types=schema))
    return ray.data.read_csv(path, **kw)


def write_documents_csv(ds, path: str, **kw):
    """Write a Dataset as partitioned CSV (one file per block)."""
    return ds.write_csv(path, **kw)
