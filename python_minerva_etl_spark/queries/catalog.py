"""The declared-query catalog — aggregates every query module.

``__spark_entry__.py`` (the driver contract) is a thin shim over this.
"""

from __future__ import annotations

from .base import DeclaredQuery


def all_queries() -> dict[str, DeclaredQuery]:
    from . import aggregation, relational

    modules = [aggregation, relational]
    for name, mod in _optional_modules():
        modules.append(mod)
    out: dict[str, DeclaredQuery] = {}
    for mod in modules:
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate declared query {q.name!r}")
            out[q.name] = q
    return out


def _optional_modules():
    """Query modules that land in later build phases; imported lazily so
    a partial checkout still exposes the finished ones."""
    names = ["windows", "trend", "ext_text", "ext_sim", "streaming_q"]
    for name in names:
        try:
            mod = __import__(f"{__package__}.{name}", fromlist=[name])
        except ImportError:
            continue
        yield name, mod
