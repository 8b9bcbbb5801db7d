"""Thread-type classification (reference parity: TicketProcessor.php:74-97).

P8: a Groove message becomes one of three HelpScout thread subtypes:
  - note=true          -> 'note'   UNLESS the author is in the
    customer-emails override list (then it is a customer thread);
  - agent_response=true -> 'message';
  - otherwise           -> 'customer'.
Comparisons are case-insensitive (P12, strcasecmp parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def classify_thread(
    is_note: Column, is_agent_response: Column, author_email: Column, override_emails: Column
) -> Column:
    """-> 'note' | 'message' | 'customer' discriminator column.

    ``override_emails`` is an ARRAY<STRING> column (usually a broadcast
    literal array) of customer emails whose notes must be treated as
    customer threads (TicketProcessor.php:76-83).
    """
    author_lc = F.lower(author_email)
    overridden = F.exists(override_emails, lambda e: F.lower(e) == author_lc)
    return (
        F.when(is_note & ~F.coalesce(overridden, F.lit(False)), F.lit("note"))
        .when(is_note & F.coalesce(overridden, F.lit(False)), F.lit("customer"))
        .when(is_agent_response, F.lit("message"))
        .otherwise(F.lit("customer"))
    )
