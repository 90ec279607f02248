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
