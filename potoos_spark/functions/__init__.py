"""The engine's scalar/column-function surface, in one namespace.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — usable in any DataFrame context and importable without a
running session. These are the building blocks the operators compose;
they are re-exported here so users extending the engine (custom
detectors via ``register_detector``, custom pipelines) work against one
stable surface instead of reaching into operator modules.
"""

from ..operators.dedup import cosine_expr, scaled_vec
from ..operators.retrieval import bucket_start
from ..operators.similarity import sign_bucket
from ..operators.text import normalize, shingles, tokens

__all__ = [
    "bucket_start",
    "cosine_expr",
    "normalize",
    "scaled_vec",
    "shingles",
    "sign_bucket",
    "tokens",
]
