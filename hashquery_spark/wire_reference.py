"""Reference wire-format (v7) interop.

The reference serializes models as versioned JSON (reference:
src/utils/serializable.py:10-15 ``HASHQUERY_WIRE_VERSION = 7``;
src/model/model.py:1102-1152; type-keyed registries
src/model/source/source.py:17-46 and
src/model/column_expression/column_expression.py:104-137). Our native
format (``Model.to_wire``) uses the same type keys but a flatter envelope,
so interop is a pure JSON↔JSON transform: ``reference_to_native`` hydrates
a model serialized by the reference client, ``native_to_reference`` emits
JSON the reference client can hydrate (``Model.to_wire(format="reference")``).

Scope is the Source/ColumnExpression subset BOTH systems share (SURVEY
§2.1/§2.9). Net-new node types with no reference counterpart (cast,
temporalRange, window, pythonUdf, pivot, fold, ...) raise a clear
``ReferenceWireError`` on emit rather than producing JSON the reference
would reject. Reference idioms with no native node map structurally:

* ``binaryOp IN`` dispatches on its right side — pyValue list → our
  ``inList``; subquery → our ``subquery(kind="in")``; anything else is the
  reference's contains() encoding (needle IN haystack with a
  ``case_sensitive`` option, reference column_expression.py:575-601) →
  our ``contains``.
* ``sqlFunction "exists" [subquery]`` (reference _sql_functions.py:103)
  → our ``subquery(kind="exists")``; a bare subquery anywhere else is the
  reference's Model-as-scalar-operand → ``subquery(kind="scalar")``.
* ``py.timedelta``/``py.timeinterval`` primitives (reference
  serializable.py:27-60) → our ``__timeinterval__`` literal.

The reference's connection payload is intentionally dropped on hydrate
(its secrets are placeholder-censored anyway, reference
duckdb_connection.py:63-80) — attach a Spark connection explicitly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

REFERENCE_WIRE_VERSION = 7
_VERSION_KEY = "_version"


class ReferenceWireError(ValueError):
    """Raised when JSON cannot be mapped to/from the reference v7 format."""


def _check_version(wire: dict) -> None:
    found = wire.get(_VERSION_KEY)
    if found != REFERENCE_WIRE_VERSION:
        # mirror the reference's version guard (serializable.py:77-91)
        raise ReferenceWireError(
            f"expected reference wire version {REFERENCE_WIRE_VERSION}, "
            f"found {found!r}"
        )


def is_reference_wire(wire: dict) -> bool:
    """Heuristic: reference payloads carry ``_version`` on every node and a
    ``connection`` key on the model envelope; native payloads do neither."""
    return _VERSION_KEY in wire or (
        wire.get("type") == "model" and "connection" in wire
    )


# --------------------------------------------------------------------------
# reference → native
# --------------------------------------------------------------------------


def _prim_r2n(value: Any) -> Any:
    """Reference $typeKey primitives → our pyValue literals."""
    if isinstance(value, dict):
        tk = value.get("$typeKey")
        if tk in ("py.datetime", "py.date"):
            return {"__datetime__": value["iso"]}
        if tk == "py.timedelta":
            return {"__timeinterval__": ["second", int(value["seconds"])]}
        if tk == "py.timeinterval":
            return {"__timeinterval__": [value["unit"], value["num"]]}
    return value


def _expr_r2n(wire: dict) -> dict:
    if wire.get("type") != "columnExpression":
        raise ReferenceWireError(f"expected columnExpression, got {wire.get('type')!r}")
    _check_version(wire)
    sub = wire["subType"]
    common = {"identifier": wire.get("manuallySetIdentifier"), "namespace": None}

    if sub == "columnName":
        return {
            "type": "columnName",
            "name": wire["columnName"],
            "namespace": wire.get("namespaceIdentifier"),
            "identifier": wire.get("manuallySetIdentifier"),
        }
    if sub == "pyValue":
        return {**common, "type": "pyValue", "value": _prim_r2n(wire["value"])}
    if sub == "binaryOp":
        left, right = wire["left"], wire["right"]
        if wire["op"] == "IN":
            if right.get("subType") == "pyValue" and isinstance(
                right.get("value"), list
            ):
                return {
                    **common,
                    "type": "inList",
                    "needle": _expr_r2n(left),
                    "items": [
                        {"type": "pyValue", "value": _prim_r2n(v),
                         "identifier": None, "namespace": None}
                        for v in right["value"]
                    ],
                }
            if right.get("subType") == "subquery":
                return {
                    **common,
                    "type": "subquery",
                    "kind": "in",
                    "model": reference_to_native(right["model"]),
                    "needle": _expr_r2n(left),
                }
            # contains(): needle IN haystack (reference :575-601)
            case_sensitive = (wire.get("options") or {}).get("case_sensitive", True)
            return {
                **common,
                "type": "contains",
                "haystack": _expr_r2n(right),
                "needle": _expr_r2n(left),
                "ci": not case_sensitive,
            }
        return {
            **common,
            "type": "binaryOp",
            "op": wire["op"],
            "left": _expr_r2n(left),
            "right": _expr_r2n(right),
        }
    if sub == "case":
        return {
            **common,
            "type": "case",
            "cases": [[_expr_r2n(c), _expr_r2n(v)] for c, v in wire["cases"]],
            "other": _expr_r2n(wire["other"]),
        }
    if sub == "granularity":
        return {
            **common,
            "type": "granularity",
            "base": _expr_r2n(wire["base"]),
            "grain": wire["granularity"],
        }
    if sub == "formatTimestamp":
        return {
            **common,
            "type": "formatTimestamp",
            "base": _expr_r2n(wire["base"]),
            "format": wire["format"],
        }
    if sub == "sqlFunction":
        args = wire.get("args", [])
        if (
            wire["functionName"] == "exists"
            and len(args) == 1
            and isinstance(args[0], dict)
            and args[0].get("subType") == "subquery"
        ):
            return {
                **common,
                "type": "subquery",
                "kind": "exists",
                "model": reference_to_native(args[0]["model"]),
                "needle": None,
            }
        return {
            **common,
            "type": "sqlFunction",
            "function": wire["functionName"],
            "args": [
                _expr_r2n(a)
                if isinstance(a, dict) and a.get("type") == "columnExpression"
                else {"type": "pyValue", "value": _prim_r2n(a),
                      "identifier": None, "namespace": None}
                for a in args
            ],
        }
    if sub == "sqlText":
        # nestedExpressions resolve by their {{ id }} placeholders against
        # the enclosing model's attributes at compile time in our engine;
        # ids that are attribute identifiers (the reference client's own
        # convention) round-trip cleanly.
        return {
            **common,
            "type": "sqlText",
            "sql": wire["sql"],
            "namespace": wire.get("namespaceIdentifier"),
            "identifier": wire.get("manuallySetIdentifier"),
        }
    if sub == "subquery":
        return {
            **common,
            "type": "subquery",
            "kind": "scalar",
            "model": reference_to_native(wire["model"]),
            "needle": None,
        }
    raise ReferenceWireError(f"unknown reference expression subType {sub!r}")


def _ns_r2n(wire: dict) -> dict:
    if wire.get("type") != "modelNamespace":
        raise ReferenceWireError("expected modelNamespace")
    return {
        "type": "modelNamespace",
        "identifier": wire["identifier"],
        "nestedModel": reference_to_native(wire["nestedModel"]),
        "throughForeignKeyAttr": (
            _expr_r2n(wire["throughForeignKeyAttr"])
            if wire.get("throughForeignKeyAttr")
            else None
        ),
    }


def _activity_r2n(wire: dict) -> dict:
    return {
        "type": "modelActivitySchema",
        "group": _expr_r2n(wire["group"]) if wire.get("group") else None,
        "timestamp": _expr_r2n(wire["timestamp"]) if wire.get("timestamp") else None,
        "eventKey": _expr_r2n(wire["eventKey"]) if wire.get("eventKey") else None,
    }


def _src_r2n(wire: dict) -> dict:
    if wire.get("type") != "source":
        raise ReferenceWireError(f"expected source, got {wire.get('type')!r}")
    _check_version(wire)
    sub = wire["subType"]
    if sub == "tableName":
        return {
            "type": "tableName",
            "table": wire["tableName"],
            "schema": wire.get("schema"),
        }
    if sub == "sqlText":
        return {"type": "sqlText", "query": wire["sql"]}
    if sub == "filter":
        return {
            "type": "filter",
            "base": _src_r2n(wire["base"]),
            "condition": _expr_r2n(wire["condition"]),
        }
    if sub == "pick":
        return {
            "type": "pick",
            "base": _src_r2n(wire["base"]),
            "columns": [_expr_r2n(c) for c in wire["columns"]],
        }
    if sub == "sort":
        return {
            "type": "sort",
            "base": _src_r2n(wire["base"]),
            "sort": _expr_r2n(wire["sort"]),
            "dir": wire["dir"],
            "nulls": wire.get("nulls", "auto"),
        }
    if sub == "limit":
        return {
            "type": "limit",
            "base": _src_r2n(wire["base"]),
            "limit": wire["limit"],
            "offset": wire.get("offset", 0),
        }
    if sub == "union":
        return {
            "type": "union",
            "base": _src_r2n(wire["base"]),
            "unionSource": _src_r2n(wire["unionSource"]),
        }
    if sub == "aggregate":
        return {
            "type": "aggregate",
            "base": _src_r2n(wire["base"]),
            "groups": [_expr_r2n(g) for g in wire["groups"]],
            "measures": [_expr_r2n(m) for m in wire["measures"]],
            "groupingMode": "group",
        }
    if sub == "joinOne":
        return {
            "type": "joinOne",
            "base": _src_r2n(wire["base"]),
            "relation": _ns_r2n(wire["relation"]),
            "joinCondition": _expr_r2n(wire["joinCondition"]),
            "dropUnmatched": wire["dropUnmatched"],
            "broadcast": False,
        }
    if sub == "matchSteps":
        tl = wire.get("timeLimit")
        if isinstance(tl, dict):  # py.timedelta primitive
            tl = int(tl.get("seconds", 0))
        return {
            "type": "matchSteps",
            "base": _src_r2n(wire["base"]),
            "activitySchema": _activity_r2n(wire["activitySchema"]),
            "steps": [
                _expr_r2n(s) if isinstance(s, dict) else s for s in wire["steps"]
            ],
            "partitionStartEvents": [
                _expr_r2n(p) for p in wire.get("partitionStartEvents", [])
            ],
            "timeLimit": tl,
            "maxEventsPerEntity": None,
            "saltPartials": None,
        }
    raise ReferenceWireError(f"unknown reference source subType {sub!r}")


def reference_to_native(wire: dict) -> dict:
    """Reference model JSON → our native ``Model.from_wire`` payload."""
    if wire.get("type") != "model":
        raise ReferenceWireError(f"expected model, got {wire.get('type')!r}")
    _check_version(wire)
    return {
        "type": "model",
        "source": _src_r2n(wire["source"]) if wire.get("source") else None,
        "attributes": [_expr_r2n(a) for a in wire.get("attributes", [])],
        "measures": [_expr_r2n(m) for m in wire.get("measures", [])],
        "namespaces": [_ns_r2n(n) for n in wire.get("namespaces", [])],
        "primaryKey": _expr_r2n(wire["primaryKey"]),
        "activitySchema": (
            _activity_r2n(wire["activitySchema"])
            if wire.get("activitySchema")
            else None
        ),
        "customMeta": wire.get("customMeta") or {},
    }


# --------------------------------------------------------------------------
# native → reference
# --------------------------------------------------------------------------


def _expr_env(sub: str, native: dict, **payload) -> dict:
    return {
        "type": "columnExpression",
        "subType": sub,
        "manuallySetIdentifier": native.get("identifier"),
        "__denormalized": {"identifier": native.get("identifier")},
        _VERSION_KEY: REFERENCE_WIRE_VERSION,
        **payload,
    }


def _pyvalue_n2r(native_value: Any) -> dict:
    v = native_value
    if isinstance(v, dict) and "__datetime__" in v:
        iso = v["__datetime__"]
        key = "py.datetime" if "T" in iso or " " in iso else "py.date"
        v = {"$typeKey": key, "iso": iso}
    elif isinstance(v, dict) and "__timeinterval__" in v:
        unit, num = v["__timeinterval__"]
        v = {"$typeKey": "py.timeinterval", "unit": unit, "num": num}
    return v


def _expr_n2r(native: dict) -> dict:
    t = native["type"]
    if t == "columnName":
        return _expr_env(
            "columnName",
            native,
            columnName=native["name"],
            namespaceIdentifier=native.get("namespace"),
        )
    if t == "pyValue":
        return _expr_env("pyValue", native, value=_pyvalue_n2r(native["value"]))
    if t == "binaryOp":
        return _expr_env(
            "binaryOp",
            native,
            left=_expr_n2r(native["left"]),
            right=_expr_n2r(native["right"]),
            op=native["op"],
            options={},
        )
    if t == "inList":
        # reference: needle IN pyValue([items]) (column_expression.py:550-558)
        items = [
            _pyvalue_n2r(i["value"])
            if i["type"] == "pyValue"
            else _raise_unrepresentable(i)
            for i in native["items"]
        ]
        return _expr_env(
            "binaryOp",
            native,
            left=_expr_n2r(native["needle"]),
            right=_expr_env("pyValue", {"identifier": None}, value=items),
            op="IN",
            options={},
        )
    if t == "contains":
        return _expr_env(
            "binaryOp",
            native,
            left=_expr_n2r(native["needle"]),
            right=_expr_n2r(native["haystack"]),
            op="IN",
            options={"case_sensitive": not native.get("ci", False)},
        )
    if t == "case":
        return _expr_env(
            "case",
            native,
            cases=[[_expr_n2r(c), _expr_n2r(v)] for c, v in native["cases"]],
            other=_expr_n2r(native["other"]),
        )
    if t == "granularity":
        return _expr_env(
            "granularity",
            native,
            base=_expr_n2r(native["base"]),
            granularity=native["grain"],
        )
    if t == "formatTimestamp":
        return _expr_env(
            "formatTimestamp",
            native,
            base=_expr_n2r(native["base"]),
            format=native["format"],
        )
    if t == "sqlFunction":
        return _expr_env(
            "sqlFunction",
            native,
            functionName=native["function"],
            args=[_expr_n2r(a) for a in native["args"]],
            inheritIdentifier=False,
        )
    if t == "sqlText":
        return _expr_env(
            "sqlText",
            native,
            sql=native["sql"],
            namespaceIdentifier=native.get("namespace"),
            nestedExpressions={},
            _unstable_type=None,
        )
    if t == "subquery":
        model_wire = native_to_reference(native["model"])
        sub = _expr_env("subquery", native, model=model_wire)
        if native["kind"] == "exists":
            return _expr_env(
                "sqlFunction",
                {"identifier": native.get("identifier")},
                functionName="exists",
                args=[sub],
                inheritIdentifier=False,
            )
        if native["kind"] == "in":
            return _expr_env(
                "binaryOp",
                {"identifier": native.get("identifier")},
                left=_expr_n2r(native["needle"]),
                right=sub,
                op="IN",
                options={},
            )
        return sub  # scalar
    _raise_unrepresentable(native)


def _raise_unrepresentable(native: dict) -> None:
    raise ReferenceWireError(
        f"node type {native.get('type')!r} has no reference wire-format v7 "
        "counterpart (net-new in hashquery_spark); serialize with the "
        "native format instead"
    )


def _src_env(sub: str, **payload) -> dict:
    return {
        "type": "source",
        "subType": sub,
        _VERSION_KEY: REFERENCE_WIRE_VERSION,
        **payload,
    }


def _ns_n2r(native: dict) -> dict:
    return {
        "type": "modelNamespace",
        "identifier": native["identifier"],
        "nestedModel": native_to_reference(native["nestedModel"]),
        "throughForeignKeyAttr": (
            _expr_n2r(native["throughForeignKeyAttr"])
            if native.get("throughForeignKeyAttr")
            else None
        ),
    }


def _activity_n2r(native: dict) -> dict:
    return {
        "type": "modelActivitySchema",
        "group": _expr_n2r(native["group"]) if native.get("group") else None,
        "timestamp": (
            _expr_n2r(native["timestamp"]) if native.get("timestamp") else None
        ),
        "eventKey": _expr_n2r(native["eventKey"]) if native.get("eventKey") else None,
    }


def _src_n2r(native: dict) -> dict:
    t = native["type"]
    if t == "tableName":
        return _src_env(
            "tableName", tableName=native["table"], schema=native.get("schema")
        )
    if t == "sqlText":
        return _src_env("sqlText", sql=native["query"])
    if t == "filter":
        return _src_env(
            "filter",
            base=_src_n2r(native["base"]),
            condition=_expr_n2r(native["condition"]),
        )
    if t == "pick":
        return _src_env(
            "pick",
            base=_src_n2r(native["base"]),
            columns=[_expr_n2r(c) for c in native["columns"]],
        )
    if t == "sort":
        return _src_env(
            "sort",
            base=_src_n2r(native["base"]),
            sort=_expr_n2r(native["sort"]),
            dir=native["dir"],
            nulls=native.get("nulls", "auto"),
        )
    if t == "limit":
        return _src_env(
            "limit",
            base=_src_n2r(native["base"]),
            limit=native["limit"],
            offset=native.get("offset", 0),
        )
    if t == "union":
        if native.get("byName"):
            # the reference's union is strictly positional — emitting this
            # as a plain union would silently change semantics
            _raise_unrepresentable({"type": "union(by_name)"})
        return _src_env(
            "union",
            base=_src_n2r(native["base"]),
            unionSource=_src_n2r(native["unionSource"]),
        )
    if t == "aggregate":
        if native.get("groupingMode", "group") != "group":
            _raise_unrepresentable(native)
        return _src_env(
            "aggregate",
            base=_src_n2r(native["base"]),
            groups=[_expr_n2r(g) for g in native["groups"]],
            measures=[_expr_n2r(m) for m in native["measures"]],
        )
    if t == "joinOne":
        return _src_env(
            "joinOne",
            base=_src_n2r(native["base"]),
            relation=_ns_n2r(native["relation"]),
            joinCondition=_expr_n2r(native["joinCondition"]),
            dropUnmatched=native["dropUnmatched"],
        )
    if t == "matchSteps":
        tl = native.get("timeLimit")
        return _src_env(
            "matchSteps",
            base=_src_n2r(native["base"]),
            activitySchema=_activity_n2r(native["activitySchema"]),
            steps=[_expr_n2r(s) for s in native["steps"]],
            partitionStartEvents=[
                _expr_n2r(p) for p in native.get("partitionStartEvents", [])
            ],
            timeLimit=(
                {"$typeKey": "py.timedelta", "seconds": int(tl)}
                if tl is not None
                else None
            ),
        )
    _raise_unrepresentable(native)


def native_to_reference(native: dict) -> dict:
    """Our native ``Model.to_wire`` payload → reference model JSON."""
    if native.get("type") != "model":
        raise ReferenceWireError(f"expected model, got {native.get('type')!r}")
    return {
        "type": "model",
        _VERSION_KEY: REFERENCE_WIRE_VERSION,
        # connection payloads are secret-censored placeholders in the
        # reference too (duckdb_connection.py:63-80); emit the minimal
        # envelope so the reference's Connection registry can dispatch.
        "connection": {
            "type": "connection",
            "subType": "duckdb",
            "tableMap": {},
            "duckDBConfig": None,
            _VERSION_KEY: REFERENCE_WIRE_VERSION,
        },
        "source": _src_n2r(native["source"]) if native.get("source") else None,
        "attributes": [_expr_n2r(a) for a in native.get("attributes", [])],
        "measures": [_expr_n2r(m) for m in native.get("measures", [])],
        "namespaces": [_ns_n2r(n) for n in native.get("namespaces", [])],
        "primaryKey": _expr_n2r(native["primaryKey"]),
        "activitySchema": (
            _activity_n2r(native["activitySchema"])
            if native.get("activitySchema")
            else None
        ),
        "customMeta": native.get("customMeta") or {},
        "linkedResource": None,
    }
