"""Generate a format-faithful Online-Retail-shaped CSV at the real
dataset's row count (541,909), for exercising the CLI's ``--csv`` path in
environments where the genuine UCI file is unreachable.

Mirrors every documented quirk of the real file
(reference dags/online_retail.py:23-32, README.md:39):

- iso-8859-1 encoding with non-ASCII description text,
- header row ``InvoiceNo,StockCode,...,Country``,
- ``C``-prefixed InvoiceNo cancellations with negative Quantity,
- NULL CustomerID (~25% of real rows) and NULL Description,
- unpadded 24-hour InvoiceDate strings ("12/1/2010 8:26") over a
  Dec 2010 - Dec 2011 span (two calendar years, matching the real file),
- per-invoice line grouping (several StockCodes share one InvoiceNo),
- country display names drawn from the values the real dataset uses.

Deterministic (seeded) so runs are reproducible.

Usage: python tools/make_retail_csv.py [OUT.csv] [N_ROWS]
"""

from __future__ import annotations

import csv
import random
import sys
from datetime import datetime, timedelta

N_ROWS_REAL = 541_909

COUNTRIES = [
    # weighted toward the UK like the real file (~91% United Kingdom)
    *(["United Kingdom"] * 60),
    "Germany", "France", "EIRE", "Spain", "Netherlands", "Belgium",
    "Switzerland", "Portugal", "Australia", "Norway", "Italy",
    "Channel Islands", "Finland", "Cyprus", "Sweden", "Unspecified",
    "Austria", "Denmark", "Japan", "Poland", "Israel", "USA",
    "Hong Kong", "Singapore", "Iceland", "Canada", "Greece", "Malta",
    "United Arab Emirates", "European Community", "RSA", "Lebanon",
    "Lithuania", "Brazil", "Czech Republic", "Bahrain", "Saudi Arabia",
]

DESCRIPTIONS = [
    "WHITE HANGING HEART T-LIGHT HOLDER",
    "JUMBO BAG RED RETROSPOT",
    "REGENCY CAKESTAND 3 TIER",
    "PARTY BUNTING",
    "LUNCH BAG RED RETROSPOT",
    "ASSORTED COLOUR BIRD ORNAMENT",
    "SET OF 3 CAKE TINS PANTRY DESIGN",
    "PAPER CHAIN KIT 50'S CHRISTMAS",
    "CAF\xc9 AU LAIT MUG",  # latin-1 exercised on purpose
    "JARDIN ETCH\xc9 GLASS TUMBLER",
    None,  # adjustment rows carry no description in the real file
]


def generate(path: str, n_rows: int = N_ROWS_REAL, seed: int = 20101201) -> None:
    rng = random.Random(seed)
    start = datetime(2010, 12, 1, 8, 26)
    with open(path, "w", encoding="iso-8859-1", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["InvoiceNo", "StockCode", "Description", "Quantity",
             "InvoiceDate", "UnitPrice", "CustomerID", "Country"]
        )
        written = 0
        invoice_no = 536365
        while written < n_rows:
            n_lines = min(rng.randint(1, 12), n_rows - written)
            cancelled = rng.random() < 0.017  # ~2% C-prefix cancellations
            inv = f"C{invoice_no}" if cancelled else str(invoice_no)
            ts = start + timedelta(minutes=rng.randint(0, 60 * 24 * 373))
            # the raw file repeats the invoice timestamp per line, with the
            # occasional discrepant line the preprocess step canonicalizes
            country = rng.choice(COUNTRIES)
            cust = rng.randint(12346, 18287) if rng.random() > 0.25 else None
            for _ in range(n_lines):
                line_ts = ts
                if rng.random() < 0.01:
                    line_ts = ts + timedelta(minutes=rng.randint(1, 9))
                qty = -rng.randint(1, 24) if cancelled else rng.randint(1, 48)
                desc = rng.choice(DESCRIPTIONS)
                price = round(rng.uniform(0.0, 18.0), 2)
                raw_date = (
                    f"{line_ts.month}/{line_ts.day}/{line_ts.year} "
                    f"{line_ts.hour}:{line_ts.minute:02d}"
                )
                w.writerow(
                    [
                        inv,
                        f"{rng.randint(10000, 23843)}",
                        desc,
                        qty,
                        raw_date,
                        price,
                        cust,
                        country,
                    ]
                )
                written += 1
            invoice_no += 1
    print(f"wrote {written} rows to {path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/online_retail_synth.csv"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_ROWS_REAL
    generate(out, n)
