"""Date parsing (reference scalar surface F3).

/root/reference/synth/utils.py:90-102 parses Submission_Date strings of the
form ``Tue Mar 03 14:21:05 GMT 2009`` (``%a %b %d %H:%M:%S %Z %Y``) with
falsy → None. JVM ``zzz`` name parsing is locale/zone-fragile (SURVEY.md
§4.3), so the default implementation strips the zone token and parses the
rest, applying the named zone's fixed offset for the common cases (GMT/UTC/
BST); unknown zones parse as UTC rather than failing (null-on-failure ethos).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Common zone abbreviations in the reference's data domain (UK-centric).
_ZONE_OFFSET_HOURS = {"GMT": 0, "UTC": 0, "BST": 1, "CET": 1, "CEST": 2}

# Spark ≥3 rejects day-of-week (EEE) in *parse* patterns — the weekday token
# is stripped before parsing (it is redundant with the date anyway).
_FMT = "MMM dd HH:mm:ss yyyy"


def parse_submission_date(col: Column) -> Column:
    """F3: parse ``EEE MMM dd HH:mm:ss zzz yyyy`` strings; empty/None → NULL.

    The zone token is extracted, removed, and re-applied as a fixed offset
    (values outside the known table are treated as UTC).
    """
    zone = F.regexp_extract(col, r"^\w{3} \w{3} \d{2} \d{2}:\d{2}:\d{2} (\w+) \d{4}$", 1)
    without_zone = F.regexp_replace(
        F.regexp_replace(col, r"^\w{3} ", ""), r" (\w+) (\d{4})$", " $2"
    )
    ts = F.to_timestamp(without_zone, _FMT)
    offset = F.lit(0)
    for name, hours in _ZONE_OFFSET_HOURS.items():
        offset = F.when(zone == name, F.lit(hours)).otherwise(offset)
    # format carries whole seconds only → epoch-seconds arithmetic is exact
    adjusted = F.timestamp_seconds(ts.cast("long") - offset.cast("long") * 3600)
    return F.when((col.isNotNull()) & (col != ""), adjusted)
