"""Pure Column transform library (SURVEY.md section 2.3).

Each function mirrors a reference transform (cited file:line into
/root/reference/) as a composable pyspark Column expression -- JVM-side,
whole-stage-codegen friendly, no Python UDFs in the hot path.
"""

from .names import split_full_name, truncate_with_flag
from .emails import EMAIL_REGEX, split_and_validate_emails, is_valid_email
from .links import extract_link_id, link_kind, GROOVE_CUSTOMER_RE, GROOVE_AGENT_RE
from .enums import groove_state_to_helpscout_status
from .timestamps import to_iso8601
from .threads import classify_thread
from . import text

__all__ = [
    "split_full_name",
    "truncate_with_flag",
    "EMAIL_REGEX",
    "split_and_validate_emails",
    "is_valid_email",
    "extract_link_id",
    "link_kind",
    "GROOVE_CUSTOMER_RE",
    "GROOVE_AGENT_RE",
    "groove_state_to_helpscout_status",
    "to_iso8601",
    "classify_thread",
    "text",
]
