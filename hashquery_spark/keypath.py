"""Deferred accessors: ``_``, ``attr``, ``msr``, ``rel``.

A compact re-implementation of the reference's KeyPath system
(reference: src/utils/keypath/keypath.py:73, resolver
src/utils/keypath/resolve.py:18-62, accessors src/model/accessors.py:37-39).

``attr.foo`` builds a deferred path that resolves lazily against whatever
Model it is finally used on; operators on keypaths defer too, so
``attr.price > 100`` resolves to a ColumnExpression comparison once the
model is known. This is DSL ergonomics, fully Spark-independent.
"""

from __future__ import annotations

from typing import Any, Dict, List, Union


class _Component:
    pass


class _Property(_Component):
    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return f".{self.name}"


class _Subscript(_Component):
    def __init__(self, key):
        self.key = key

    def __repr__(self):
        return f"[{self.key!r}]"


class _Call(_Component):
    def __init__(self, args, kwargs):
        self.args = list(args)
        self.kwargs = dict(kwargs)

    def __repr__(self):
        parts = [repr(a) for a in self.args] + [f"{k}={v!r}" for k, v in self.kwargs.items()]
        return f"({', '.join(parts)})"


class KeyPath:
    """An ordered list of access components rooted at "the model"."""

    def __init__(self, components: List[_Component]) -> None:
        object.__setattr__(self, "_components", components)

    def _chain(self, component: _Component) -> "KeyPath":
        return KeyPath([*self._components, component])

    def __getattr__(self, name: str) -> "KeyPath":
        if name.startswith("_keypath") or name in ("_components",):
            raise AttributeError(name)
        return self._chain(_Property(name))

    def __getitem__(self, key) -> "KeyPath":
        return self._chain(_Subscript(key))

    def __call__(self, *args, **kwargs) -> "KeyPath":
        return self._chain(_Call(args, kwargs))

    def __repr__(self):
        return f"KeyPath(_{''.join(map(repr, self._components))})"

    def __hash__(self):
        return id(self)

    def __bool__(self):
        raise TypeError("KeyPath cannot be evaluated as a Python boolean")


# Defer operators: `attr.x + 1` == `attr.x.__add__(1)` deferred.
_DEFERRED_OPS = [
    "__eq__", "__ne__", "__lt__", "__le__", "__gt__", "__ge__",
    "__add__", "__radd__", "__sub__", "__rsub__", "__mul__", "__rmul__",
    "__truediv__", "__rtruediv__", "__floordiv__", "__and__", "__or__",
    "__invert__", "__neg__",
]


def _make_deferred(op_name: str):
    def deferred(self, *args):
        return self._chain(_Property(op_name))._chain(_Call(args, {}))

    deferred.__name__ = op_name
    return deferred


for _op in _DEFERRED_OPS:
    setattr(KeyPath, _op, _make_deferred(_op))


class BoundKeyPath(KeyPath):
    """A KeyPath whose root is already a concrete value."""

    def __init__(self, bound_root, components: List[_Component]) -> None:
        super().__init__(components)
        object.__setattr__(self, "_bound_root", bound_root)

    def _chain(self, component: _Component) -> "BoundKeyPath":
        return BoundKeyPath(self._bound_root, [*self._components, component])

    def __repr__(self):
        return f"BoundKeyPath({self._bound_root!r}{''.join(map(repr, self._components))})"


class _MapAccessor:
    """``attr`` / ``msr`` / ``rel`` — deferred lookups in a model's
    identifiable maps (reference: src/model/accessors.py:10-39)."""

    def __init__(self, map_name: str) -> None:
        self.__map_name__ = map_name

    def __getattr__(self, key: str):
        if key == "__map_name__":
            raise AttributeError(key)
        return KeyPath([_Property("_access_identifiable_map"), _Call([self.__map_name__, key], {})])

    def __getitem__(self, key: str):
        return self.__getattr__(key)


_ = KeyPath([])
attr = _MapAccessor("_attributes")
msr = _MapAccessor("_measures")
rel = _MapAccessor("_namespaces")


def resolve_keypath(root: Any, keypath: Any) -> Any:
    """Resolve a keypath against a concrete root (usually a Model)."""
    if not isinstance(keypath, KeyPath):
        return keypath
    current = root
    if isinstance(keypath, BoundKeyPath):
        current = keypath._bound_root
    for component in keypath._components:
        if isinstance(component, _Property):
            current = getattr(current, component.name)
        elif isinstance(component, _Subscript):
            current = current[component.key]
        elif isinstance(component, _Call):
            args = resolve_all_nested_keypaths(root, component.args)
            kwargs = resolve_all_nested_keypaths(root, component.kwargs)
            current = current(*args, **kwargs)
    # a keypath may resolve to another keypath
    return resolve_keypath(root, current)


def has_keypaths(values: Any) -> bool:
    if isinstance(values, KeyPath):
        return True
    if isinstance(values, dict):
        return any(has_keypaths(v) for v in values.values())
    if isinstance(values, (list, tuple)):
        return any(has_keypaths(v) for v in values)
    return False


def defer_keypath_args(fn):
    """If any argument is (or contains) a KeyPath, return a BoundKeyPath that
    re-invokes ``fn`` once the keypaths resolve against a model
    (reference: src/utils/keypath/resolve.py ``defer_keypath_args``)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if has_keypaths(args) or has_keypaths(kwargs):
            return BoundKeyPath(fn, [_Call(args, kwargs)])
        return fn(*args, **kwargs)

    return wrapped


def resolve_all_nested_keypaths(root: Any, values: Any) -> Any:
    """Recursively resolve keypaths inside dicts/lists/tuples."""
    if isinstance(values, dict):
        return {k: resolve_all_nested_keypaths(root, v) for k, v in values.items()}
    if isinstance(values, list):
        return [resolve_all_nested_keypaths(root, v) for v in values]
    if isinstance(values, tuple):
        return tuple(resolve_all_nested_keypaths(root, v) for v in values)
    if isinstance(values, KeyPath):
        return resolve_all_nested_keypaths(root, resolve_keypath(root, values))
    return values
