"""Query-surface configs, re-expressing the reference's dataclasses.

Reference parity: ``TimeSeriesConfig`` mirrors the retrieval surface of
/root/reference/potoos/models/config.py:6-60 (RedisTimeSeries ``TS.RANGE``
semantics), and ``DetectorConfig`` mirrors
/root/reference/potoos/models/config.py:63-100 (Luminol dispatch surface).
Both ``__post_init__`` validations of the reference are kept:
aggregation requires a bucket size (config.py:57-60) and a detector
algorithm must be named or given as a callable (config.py:92-100).

Differences from the reference (intentional, Spark-first):

* Times are always integer Unix **milliseconds** (the reference's native
  unit); ``"-"`` / ``"+"`` sentinels mean unbounded, as in RTS.
* ``count`` (sample cap) is applied **per series**, since one DataFrame
  carries many series at once.
* The reference's ``reversed`` flag is a presentation property: it flips
  the ordering used by the ``count`` cap and the output sort.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Union

# The 12 RTS bucket aggregators, literal list at reference config.py:41.
AGGREGATION_TYPES = (
    "avg",
    "sum",
    "min",
    "max",
    "range",
    "count",
    "first",
    "last",
    "std.p",
    "std.s",
    "var.p",
    "var.s",
)

# Detector algorithms with native implementations (reference config.py:86
# + published Luminol algorithm names).
ALGORITHM_NAMES = (
    "derivative_detector",
    "exp_avg_detector",
    "bitmap_detector",
    "default_detector",
    "absolute_threshold",
    "diff_percent_threshold",
    "sign_test",
)

TimeBound = Union[int, str]  # ms epoch, or '-'/'+' for unbounded


@dataclass
class TimeSeriesConfig:
    """Retrieval query description (scan + filter + agg + sort + limit).

    Mirrors /root/reference/potoos/models/config.py:6-60 field-for-field;
    each field maps to one operator in SURVEY.md §2.2-2.3.
    """

    from_time: TimeBound = "-"  # F1 lower bound (inclusive, ms)
    to_time: TimeBound = "+"  # F1 upper bound (inclusive, ms)
    count: Optional[int] = None  # A16 per-series sample cap
    filter_by_ts: Optional[Sequence[int]] = None  # F2 timestamp IN-list (ms)
    filter_by_min_value: Optional[float] = None  # F3 lower value bound
    filter_by_max_value: Optional[float] = None  # F3 upper value bound
    aggregation_type: Optional[str] = None  # A1-A12
    bucket_size_msec: Optional[int] = None  # A1-A12 bucket width
    align: Optional[Union[int, str]] = None  # A13: 'start' | 'end' | ms epoch
    latest: bool = False  # A15 duplicate-ts dedup (keep latest)
    bucket_timestamp: Optional[str] = None  # A14: '-' start | '~' mid | '+' end
    reversed: bool = False  # S2 presentation order

    def __post_init__(self) -> None:
        # Reference validation, config.py:57-60.
        if self.aggregation_type is not None:
            if self.aggregation_type not in AGGREGATION_TYPES:
                raise ValueError(
                    f"unknown aggregation_type {self.aggregation_type!r}; "
                    f"expected one of {AGGREGATION_TYPES}"
                )
            if self.bucket_size_msec is None:
                raise ValueError(
                    "bucket_size_msec is required when aggregation_type is set"
                )
        if self.bucket_timestamp is not None and self.bucket_timestamp not in (
            "-",
            "~",
            "+",
        ):
            raise ValueError("bucket_timestamp must be one of '-', '~', '+'")
        if self.align is not None and isinstance(self.align, str):
            if self.align not in ("start", "end"):
                raise ValueError("align must be 'start', 'end', or an int epoch ms")

    def lower_ms(self) -> Optional[int]:
        return None if self.from_time in ("-", None) else int(self.from_time)

    def upper_ms(self) -> Optional[int]:
        return None if self.to_time in ("+", None) else int(self.to_time)

    def align_offset_ms(self) -> int:
        """A13: bucket boundaries are shifted so that one boundary falls on
        the align timestamp; offset = align mod bucket (RTS `ALIGN`)."""
        if self.align is None or self.bucket_size_msec is None:
            return 0
        if self.align == "start":
            anchor = self.lower_ms()
        elif self.align == "end":
            anchor = self.upper_ms()
        else:
            anchor = int(self.align)
        if anchor is None:
            return 0
        return anchor % int(self.bucket_size_msec)


@dataclass
class DetectorConfig:
    """Detector dispatch config, mirroring reference config.py:63-100.

    Default algorithm is ``derivative_detector`` per the code
    (reference config.py:86; the README's ``bitmap_detector`` claim is a
    documentation bug — SURVEY.md §2.4).
    """

    algorithm_name: Optional[str] = "derivative_detector"
    algorithm_class: Optional[Callable[..., Any]] = None  # D8 plugin
    algorithm_params: dict = field(default_factory=dict)
    score_threshold: Optional[float] = None  # D10 absolute threshold
    score_percent_threshold: Optional[float] = None  # D10 fraction of max score
    score_only: bool = False  # skip window extraction
    baseline: Optional[Any] = None  # D6/D7 baseline DataFrame
    refine_algorithm_name: Optional[str] = None  # D9
    refine_algorithm_params: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        # Reference validation, config.py:92-100.
        if self.algorithm_name is None and self.algorithm_class is None:
            raise ValueError("one of algorithm_name / algorithm_class is required")
        if (
            self.algorithm_name is not None
            and self.algorithm_class is None
            and self.algorithm_name not in ALGORITHM_NAMES
        ):
            # D8: names registered through the plugin registry are valid
            # (the reference accepts any name and lets Luminol resolve it)
            from .detectors.base import is_registered

            if not is_registered(self.algorithm_name):
                raise ValueError(
                    f"unknown algorithm_name {self.algorithm_name!r}; "
                    f"expected one of {ALGORITHM_NAMES} or a registered plugin"
                )
