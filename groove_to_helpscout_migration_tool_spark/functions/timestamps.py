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
    # date_format's XXX renders the SESSION zone's offset, not the target
    # zone's, so the offset must be computed explicitly: shift the wall
    # clock with from_utc_timestamp, then derive the zone offset from the
    # epoch delta between shifted and original instants (DST-correct,
    # per-row). PHP format('c') always prints +HH:MM, never 'Z'.
    shifted = F.from_utc_timestamp(ts, with_offset_zone)
    off_min = (
        (shifted.cast("long") - ts.cast("long")) / F.lit(60)
    ).cast("long")
    sign = F.when(off_min < 0, F.lit("-")).otherwise(F.lit("+"))
    abs_min = F.abs(off_min)
    offset = F.concat(
        sign,
        F.lpad((abs_min / 60).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((abs_min % 60).cast("string"), 2, "0"),
    )
    return F.concat(F.date_format(shifted, ISO8601), offset)
