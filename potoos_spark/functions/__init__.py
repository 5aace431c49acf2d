"""The engine's scalar/column-function surface, in one namespace.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — usable in any DataFrame context and importable without a
running session. These are the building blocks the operators compose;
they are re-exported here so users extending the engine (custom
detectors via ``register_detector``, custom pipelines) work against one
stable surface instead of reaching into operator modules.
"""

from ..operators.dedup import (
    cosine_expr,
    cosine_from_norms,
    scaled_vec,
    simhash_fingerprint,
    sqnorm_expr,
)
from ..operators.retrieval import bucket_start
from ..operators.similarity import sign_bucket, sign_buckets_multi
from ..operators.text import (
    bpe_token_count,
    normalize,
    shingles,
    tokens,
)

__all__ = [
    "bpe_token_count",
    "bucket_start",
    "cosine_expr",
    "cosine_from_norms",
    "normalize",
    "scaled_vec",
    "shingles",
    "sign_bucket",
    "sign_buckets_multi",
    "simhash_fingerprint",
    "sqnorm_expr",
    "tokens",
]
