"""Source registry — named, registrable readers.

Reference analogue: the data-import plugin registry
(``fast_carpenter/data_import/__init__.py:6-41``: named plugins with
``register_data_import_plugin`` / ``get_data_import_plugin``).  Ours maps a
format name to a function ``(paths, columns=None, **kwargs) -> Dataset``
built on ``ray.data.read_*`` (which natively splits files into blocks — the
reference's single-path uproot limitation does not apply).

Column pruning: every reader accepts ``columns=`` and passes it to the
read so only needed columns leave storage (projection pushdown at the
read; SURVEY.md "prune at the read").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

__all__ = ["register_source", "get_source", "read_parquet", "read_pages"]

_REGISTRY: Dict[str, Callable] = {}


class UnknownSource(Exception):
    pass


def register_source(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def get_source(name: str) -> Callable:
    if name not in _REGISTRY:
        raise UnknownSource(
            f"unknown source {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def read_parquet(paths, columns: Optional[Sequence[str]] = None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(paths, columns=list(columns) if columns else None,
                           **kwargs)


def read_csv(paths, columns: Optional[Sequence[str]] = None, **kwargs):
    import ray.data as rd

    ds = rd.read_csv(paths, **kwargs)
    return ds.select_columns(list(columns)) if columns else ds


def read_json(paths, columns: Optional[Sequence[str]] = None, **kwargs):
    import ray.data as rd

    ds = rd.read_json(paths, **kwargs)
    return ds.select_columns(list(columns)) if columns else ds


def read_pages(sf_dir: str, replicate: int = 1, **_):
    """The synthetic Common-Crawl-style pages source (input_hint schema)."""
    from ..fixtures import pages_dataset

    return pages_dataset(sf_dir, replicate=replicate)


register_source("parquet", read_parquet)
register_source("csv", read_csv)
register_source("json", read_json)
register_source("pages", read_pages)
