"""Email splitting & validation (reference parity: CustomerProcessor.php:90-133).

P4 semantics, preserved bit-for-bit:
  - the raw email field may hold MULTIPLE addresses separated by
    space / ';' / ',' (single-char separators);
  - blank fragments are skipped;
  - every fragment is syntactically validated;
  - if ANY fragment is invalid the whole split is abandoned and the
    ORIGINAL unsplit string is kept as the single (primary) address;
  - otherwise the first valid fragment is 'primary' and the rest 'other'.

All higher-order-function Columns (filter/forall/transform) -- JVM-side,
no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-lite pattern, same class PHP's FILTER_VALIDATE_EMAIL accepts for
# ordinary addresses. Kept simple & identical in the DuckDB oracles.
EMAIL_REGEX = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def is_valid_email(col: Column) -> Column:
    """P11 syntactic email gate (TicketProcessor.php:414)."""
    return col.rlike(EMAIL_REGEX)


def split_and_validate_emails(raw: Column) -> Column:
    """-> struct(emails ARRAY<STRING>, all_valid BOOLEAN, primary STRING).

    ``emails`` holds the split list when every fragment validates, else
    the single-element original string (the reference's fallback,
    CustomerProcessor.php:108-117). ``primary`` = first element.
    """
    fragments = F.filter(F.split(raw, "[ ;,]"), lambda x: x != F.lit(""))
    all_valid = F.forall(fragments, lambda x: x.rlike(EMAIL_REGEX))
    emails = F.when(all_valid, fragments).otherwise(F.array(raw))
    return F.struct(
        emails.alias("emails"),
        all_valid.alias("all_valid"),
        F.element_at(emails, 1).alias("primary"),
    )
