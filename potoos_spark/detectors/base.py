"""Detector registry + dispatch (SURVEY.md §2.4).

The reference dispatches by name into Luminol
(``AnomalyDetector(ts, **cfg)``, /root/reference/potoos/client.py:91) and
accepts a user-supplied ``algorithm_class`` (D8, reference
config.py:90,99-100). Here each algorithm is a function
``(scores_input: DataFrame, params: dict) -> DataFrame`` over the
canonical many-series frame, returning ``(series_key, ts_ms, value,
score)``. Luminol is not a dependency: algorithms are re-implemented
natively from the published algorithm descriptions
(github.com/linkedin/luminol), vectorized per series.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame

from ..config import DetectorConfig

DetectorFn = Callable[..., DataFrame]

_REGISTRY: Dict[str, DetectorFn] = {}


def register_detector(name: str) -> Callable[[DetectorFn], DetectorFn]:
    """D8: plugin registry — user algorithms register under a name and are
    dispatched identically to built-ins."""

    def deco(fn: DetectorFn) -> DetectorFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def is_registered(name: str) -> bool:
    return name in _REGISTRY


def get_detector(name: str) -> DetectorFn:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown detector {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def score(
    df: DataFrame,
    cfg: Optional[DetectorConfig] = None,
    baseline: Optional[DataFrame] = None,
) -> DataFrame:
    """Score every point of every series (reference ``get_all_scores()``
    path, client.py:95). Returns (series_key, ts_ms, value, score)."""
    cfg = cfg or DetectorConfig()
    if cfg.algorithm_class is not None:
        fn: DetectorFn = cfg.algorithm_class  # D8: direct callable
    else:
        fn = get_detector(cfg.algorithm_name)
    baseline = baseline if baseline is not None else cfg.baseline
    if baseline is not None:
        return fn(df, baseline=baseline, **cfg.algorithm_params)
    return fn(df, **cfg.algorithm_params)
