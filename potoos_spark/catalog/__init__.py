"""The oracle-checked query catalog: one entry per implemented operator
(SURVEY.md §2 + the LLM-data-pipeline extensions)."""

from __future__ import annotations

from .common import QuerySpec
from . import (
    correlate,
    detectors,
    gapfill,
    graph,
    mllib,
    mrange,
    pipeline,
    relational,
    relational_ext,
    relational_tpch,
    sketch,
    streaming,
    timeseries,
)

CATALOG: dict[str, QuerySpec] = {}
CATALOG.update(timeseries.QUERIES)
CATALOG.update(detectors.QUERIES)
CATALOG.update(relational.QUERIES)
CATALOG.update(relational_ext.QUERIES)
CATALOG.update(relational_tpch.QUERIES)
CATALOG.update(sketch.QUERIES)
CATALOG.update(pipeline.QUERIES)
CATALOG.update(streaming.QUERIES)
CATALOG.update(mllib.QUERIES)
CATALOG.update(mrange.QUERIES)
CATALOG.update(correlate.QUERIES)
CATALOG.update(gapfill.QUERIES)
CATALOG.update(graph.QUERIES)
