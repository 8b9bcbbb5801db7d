"""Name handling (reference parity: APIHelper.php:166-189).

P2 full-name split: the FIRST space splits first/last name; a name with
no space becomes (name, NULL); the remainder is trimmed.
P3 length truncation: values over a cap are truncated and flagged so the
caller can emit the reference's warning side-channel instead of failing
the record.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_full_name(name: Column) -> Column:
    """Split a full name on the first space -> struct(first_name, last_name).

    Mirrors APIHelper.php:166-176: no space => last name NULL; remainder
    of the string (which may itself contain spaces) is trimmed into the
    last name.
    """
    has_space = F.instr(name, " ") > 0
    first = F.when(has_space, F.substring_index(name, " ", 1)).otherwise(name)
    last = F.when(has_space, F.trim(F.substr(name, F.instr(name, " ") + 1))).otherwise(
        F.lit(None).cast("string")
    )
    return F.struct(first.alias("first_name"), last.alias("last_name"))


def truncate_with_flag(col: Column, max_len: int) -> Column:
    """Truncate to ``max_len`` chars -> struct(value, was_truncated).

    Mirrors the 40-char name cap (APIHelper.php:180-189) and 60-char
    organization/job-title caps (CustomerProcessor.php:65-76): truncate,
    never fail, and surface a flag for the warning side-channel.
    """
    too_long = F.length(col) > max_len
    return F.struct(
        F.when(too_long, F.substring(col, 1, max_len)).otherwise(col).alias("value"),
        too_long.alias("was_truncated"),
    )
