"""Timestamp normalization (reference parity: TicketProcessor.php:99-100,327-328,436-437).

P10: parse whatever timestamp the source hands us and re-serialize as
ISO-8601. The reference pins the app TZ to America/Toronto
(SyncTickets.php:38); here the zone is an explicit argument so results
never depend on session state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO8601 = "yyyy-MM-dd'T'HH:mm:ss"


def to_iso8601(ts: Column, with_offset_zone: str | None = None) -> Column:
    """Format a timestamp column as an ISO-8601 string.

    ``with_offset_zone`` renders the wall-clock in that zone with its
    UTC offset appended (PHP ``format('c')`` parity); None keeps the
    zone-less form.
    """
    if with_offset_zone is None:
        return F.date_format(ts, ISO8601)
    shifted = F.from_utc_timestamp(ts, with_offset_zone)
    return F.date_format(shifted, "yyyy-MM-dd'T'HH:mm:ssXXX")
