"""Enum mapping (reference parity: APIHelper.php:198-218).

P7: Groove ticket state -> HelpScout conversation status; an unknown
state maps to NULL and the caller routes the row to the error
side-channel (the reference logs and skips, never throws).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STATE_TO_STATUS = {
    "unread": "active",
    "opened": "active",
    "pending": "pending",
    "closed": "closed",
    "spam": "spam",
}


def groove_state_to_helpscout_status(state: Column) -> Column:
    expr = F.when(F.lit(False), F.lit(None).cast("string"))
    for k, v in STATE_TO_STATUS.items():
        expr = expr.when(state == k, F.lit(v))
    return expr.otherwise(F.lit(None).cast("string"))
