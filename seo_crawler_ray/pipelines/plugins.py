"""Analysis-plugin registry: user-supplied Dataset -> Dataset/DataFrame
stages over the crawl output tables.

This is the Ray analog of the reference's JS tab-plugin surface
(/root/reference/web/static/js/plugin-loader.js and
/root/reference/web/static/plugins/README.md:1-124): a plugin declares a
name, which output table it consumes, the columns it needs, and a ``run``
callable. The engine prunes the read to the declared columns (so a plugin
touching 3 fields never deserializes the 33-column pages table) and hands
the plugin a streaming Dataset — the plugin composes map_batches/groupby
like any built-in stage.

The E-E-A-T scorer (the reference's flagship example plugin, e-e-a-t.js)
is registered here as the canonical built-in; ``register()`` adds user
plugins at import time, mirroring the reference's drop-a-file-in-plugins/
loading model.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class AnalysisPlugin:
    name: str                      # unique id (plugin-loader.js `id`)
    title: str                     # display name (plugin manifest `name`)
    table: str                     # input table: "pages" | "links"
    columns: list[str] = field(default_factory=list)  # [] = all columns
    run: Callable[[Any], Any] = None  # Dataset -> Dataset | DataFrame


_REGISTRY: dict[str, AnalysisPlugin] = {}


def register(plugin: AnalysisPlugin) -> AnalysisPlugin:
    if plugin.table not in ("pages", "links"):
        raise ValueError(f"unknown input table {plugin.table!r}")
    if plugin.run is None:
        raise ValueError("plugin.run is required")
    if plugin.name in _REGISTRY:
        raise ValueError(f"plugin {plugin.name!r} already registered")
    _REGISTRY[plugin.name] = plugin
    return plugin


def unregister(name: str) -> None:
    _REGISTRY.pop(name, None)


def list_plugins() -> list[str]:
    return sorted(_REGISTRY)


def get(name: str) -> AnalysisPlugin:
    return _REGISTRY[name]


def run_plugin(name: str, pages_ds=None, links_ds=None):
    """Resolve the plugin's declared input (column-pruned) and run it."""
    plugin = _REGISTRY[name]
    ds = pages_ds if plugin.table == "pages" else links_ds
    if ds is None:
        raise ValueError(f"plugin {name!r} needs the {plugin.table} table")
    if plugin.columns:
        ds = ds.select_columns(plugin.columns)
    return plugin.run(ds)


# ---------------------------------------------------------- built-ins ----
def _register_builtins() -> None:
    from . import analysis

    register(AnalysisPlugin(
        name="eeat-scores", title="E-E-A-T Analysis (per page)",
        table="pages", columns=list(analysis._EEAT_COLS),
        run=analysis.eeat_scores))
    register(AnalysisPlugin(
        name="eeat-summary", title="E-E-A-T Analysis (site summary)",
        table="pages", columns=list(analysis._EEAT_COLS),
        run=analysis.eeat_summary))
    register(AnalysisPlugin(
        name="status-counts", title="HTTP Status Breakdown",
        table="pages", columns=["status_code"],
        run=analysis.status_counts))
    register(AnalysisPlugin(
        name="linked-from", title="Reverse Link Index",
        table="links", columns=["target_url", "source_url", "source_rank"],
        run=analysis.linked_from))


_register_builtins()
