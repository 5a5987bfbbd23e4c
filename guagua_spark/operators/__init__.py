"""Query operators: the declared relational queries certifying guagua
operator semantics (SURVEY.md §2.10), plus the beyond-reference
training-data-pipeline operators (dedup, similarity, text, multimodal).

The generic, reusable DataFrame operators live here for direct
import: ``asof_join`` (point-in-time join), ``connected_components``
(distributed min-label propagation), ``pagerank`` (BSP supersteps as
joins), ``deterministic_shuffle`` (seeded total-order permutation),
and ``weighted_sample`` (Efraimidis–Spirakis without replacement).
"""

from guagua_spark.operators.dedup import (  # noqa: F401
    connected_components,
    minhash_pairs_for,
)
from guagua_spark.operators.events import asof_join  # noqa: F401
from guagua_spark.operators.graph import pagerank  # noqa: F401
from guagua_spark.operators.packing import (  # noqa: F401
    deterministic_shuffle,
)
from guagua_spark.operators.pipeline import weighted_sample  # noqa: F401

__all__ = [
    "asof_join",
    "connected_components",
    "deterministic_shuffle",
    "minhash_pairs_for",
    "pagerank",
    "weighted_sample",
]
