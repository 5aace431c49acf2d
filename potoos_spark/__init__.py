"""potoos_spark — a PySpark-native analytics engine with the query surface
of afranche7/Potoos (time-series retrieval + anomaly detection), extended
with large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing). See SURVEY.md for the blueprint.
"""

from .api import AnomalyResult, PotoosSession
from .config import DetectorConfig, TimeSeriesConfig
from .session import get_session, normalize_session

# Importing registers the built-in detectors.
from .detectors import builtin as _builtin_detectors  # noqa: F401
from .detectors import sequential as _sequential_detectors  # noqa: F401
from .detectors.base import get_detector, register_detector, score

__all__ = [
    "AnomalyResult",
    "PotoosSession",
    "DetectorConfig",
    "TimeSeriesConfig",
    "get_session",
    "normalize_session",
    "get_detector",
    "register_detector",
    "score",
]
