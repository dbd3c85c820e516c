"""A local file-based model catalog over the wire format.

The reference's semantic-layer ingestion (``HashboardProject`` import,
reference: src/integration/hashboard/hashboard_project.py +
project_importer.py) hydrates ``Model`` objects from a REMOTE catalog via
the versioned JSON wire format (Model._from_wire_format,
src/model/model.py:1125-1152). This is the same boundary pointed at a
directory: every model is one JSON document, so saved models are
inspectable, diffable, and shareable across processes — a team's "metric
definitions live in files, queries import them" workflow without a
server.

The version guard mirrors the reference's (src/utils/serializable.py:
77-91): documents written by a NEWER wire version are refused loudly
instead of being half-parsed.
"""

from __future__ import annotations

import json
import os
import re
from typing import List, Optional

from .connection import Connection
from .model import Model

_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$")


class ModelCatalog:
    """Directory of named model definitions (one ``<name>.json`` each)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, name: str) -> str:
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid model name {name!r}")
        return os.path.join(self.path, f"{name}.json")

    def save(self, name: str, model: Model) -> str:
        """Serialize to ``<dir>/<name>.json``; returns the path. Models
        containing local-only pieces (python_udf / pandas transforms)
        raise — the wire format is the portability contract."""
        doc = model.to_wire()
        target = self._file(name)
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=2, sort_keys=True)
        os.replace(tmp, target)  # atomic: readers never see a torn file
        return target

    def load(self, name: str, connection: Optional[Connection] = None) -> Model:
        with open(self._file(name)) as f:
            doc = json.load(f)
        version = doc.get("version")
        if not isinstance(version, int) or version > Model.WIRE_VERSION:
            raise ValueError(
                f"model {name!r} was written by wire version {version!r}; "
                f"this engine reads up to version {Model.WIRE_VERSION} — "
                "upgrade before loading it"
            )
        return Model.from_wire(doc, connection=connection)

    def names(self) -> List[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.path)
            if f.endswith(".json")
        )

    def delete(self, name: str) -> None:
        os.remove(self._file(name))
