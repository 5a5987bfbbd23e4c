"""Query operators: the declared relational queries certifying guagua
operator semantics (SURVEY.md §2.10), plus the beyond-reference
training-data-pipeline operators (dedup, similarity, text, multimodal).

The two generic, reusable DataFrame operators live here for direct
import: ``asof_join`` (point-in-time join) and ``connected_components``
(distributed min-label propagation).
"""

from guagua_spark.operators.dedup import (  # noqa: F401
    connected_components,
    minhash_pairs_for,
)
from guagua_spark.operators.events import asof_join  # noqa: F401

__all__ = ["asof_join", "connected_components", "minhash_pairs_for"]
