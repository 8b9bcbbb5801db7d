"""Query catalog: importing this package registers every query.

Submodules:
    relational    - TPC-H-style analytics + windows/set-ops/cube/JSON/as-of
    reference_ops - SURVEY.md section 2 operators mapped onto the test tables
    llm_ops       - dedup / similarity / text-analysis / multimodal extensions
"""

from . import relational  # noqa: F401
from . import partsupp  # noqa: F401
from . import reference_ops  # noqa: F401
from . import reference_ops_ext  # noqa: F401
from . import llm_ops  # noqa: F401

from ..registry import QUERIES, queries, oracle_sql  # noqa: F401
