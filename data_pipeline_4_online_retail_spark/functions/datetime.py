"""Datetime parsing/formatting matching the reference's conventions.

The reference round-trips InvoiceDate through the BigQuery strptime pattern
``%m/%d/%Y %I:%M %p`` (written by pandas at dags/online_retail.py:48, parsed
back by dim_datetime.sql:5). The Java-time equivalent is
``MM/dd/yyyy hh:mm a`` — including the 12-hour-clock 12 AM/PM edge cases.

Parsing is null-coercing (non-ANSI ``to_timestamp``), mirroring
``pd.to_datetime(errors='coerce')`` (dags/online_retail.py:38).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BigQuery %m/%d/%Y %I:%M %p  ==  Java MM/dd/yyyy hh:mm a
INVOICE_DATE_FMT = "MM/dd/yyyy hh:mm a"
# The raw UCI download uses unpadded 24-hour strings ("12/1/2010 8:26");
# the reference's pd.to_datetime auto-detects both forms
# (dags/online_retail.py:38), so parsing tries canonical then raw.
INVOICE_DATE_FMT_RAW = "M/d/yyyy H:mm"


def parse_invoice_datetime(col: str | Column) -> Column:
    """String → timestamp; unparseable values become NULL regardless of
    session ANSI mode (try_to_timestamp — the explicit coerce form of
    pd.to_datetime(errors='coerce')). Accepts the canonical AM/PM form
    and the raw file's 24-hour form; the two are unambiguous (a trailing
    AM/PM marker fails the 24h pattern and vice versa)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(INVOICE_DATE_FMT)),
        F.try_to_timestamp(c, F.lit(INVOICE_DATE_FMT_RAW)),
    )


def format_invoice_datetime(col: str | Column) -> Column:
    """Timestamp → the reference's canonical string form
    (e.g. ``12/01/2010 08:26 AM``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, INVOICE_DATE_FMT)


def datetime_parts(col: str | Column) -> dict[str, Column]:
    """The EXTRACT(...) family used by dim_datetime.sql:13-18.

    ``weekday`` follows the BigQuery DAYOFWEEK convention 1=Sunday..7=Saturday,
    which is also Spark's ``dayofweek`` — a direct match (SURVEY.md §2.9 F5).
    """
    c = F.col(col) if isinstance(col, str) else col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
        "minute": F.minute(c),
        "weekday": F.dayofweek(c),
    }
