"""Sources: fixtures (offline stand-ins for the Groove/HelpScout APIs),
paginated API readers, and the rate-limit governor."""

from .fixtures import groove_fixtures, helpscout_fixtures

__all__ = ["groove_fixtures", "helpscout_fixtures"]
