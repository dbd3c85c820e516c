"""hashquery_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hashboard-hq/hashquery.

The reference is a Python query-builder DSL + SQL compiler targeting 9
warehouse dialects; this package re-expresses the same semantic layer and
operator surface on exactly one engine — Apache Spark — where the lazy
DataFrame / Catalyst pipeline plays the role SQLAlchemy + the remote
warehouse play in the reference (see SURVEY.md).

Public surface mirrors the reference's top-level exports
(reference: src/__init__.py)::

    from hashquery_spark import Model, Connection, column, func, attr, msr, rel, _
"""

from . import func
from .connection import Connection, connection_for_dir, default_session
from .expr import ColumnExpression, column
from .keypath import _, attr, msr, rel
from .catalog import ModelCatalog
from .model import Model, ModelNamespace, RunResults
from .timeinterval import timeinterval

__all__ = [
    "ModelCatalog",
    "Model",
    "Connection",
    "ColumnExpression",
    "RunResults",
    "ModelNamespace",
    "column",
    "func",
    "attr",
    "msr",
    "rel",
    "_",
    "timeinterval",
    "connection_for_dir",
    "default_session",
]

__version__ = "0.1.0"
