"""Static country lookup seed (SURVEY.md §2.1 S7-S10).

The reference creates a ``country`` table from an inline 239-row
``INSERT ... VALUES`` of the public ISO-3166 list, then mutates it with
``ALTER TABLE`` (include/table/country.sql:1-9 DDL, :11-250 insert,
:252-259 drop ``id``+``name``, rename ``nicename``→``name``).

Spark-first: the literal rows become a ``createDataFrame`` LocalRelation;
the ALTERs become projections composed into the seed build (no in-place
mutation — the built seed IS the post-ALTER shape). Rows below are the
ISO-3166 subset covering every Country value that occurs in the Online
Retail dataset plus unmatched extras; the full public list drops in
unchanged.

Row shape (pre-ALTER): (id, iso, name_upper, nicename, iso3, numcode, phonecode)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_4_online_retail_spark.sources.schemas import COUNTRY_SEED_RAW

# Public ISO-3166 data (subset; same shape as the classic "country" SQL dump
# the reference inlines).
COUNTRY_ROWS: list[tuple[int, str, str, str, str | None, int | None, int]] = [
    (13, "AU", "AUSTRALIA", "Australia", "AUS", 36, 61),
    (14, "AT", "AUSTRIA", "Austria", "AUT", 40, 43),
    (17, "BH", "BAHRAIN", "Bahrain", "BHR", 48, 973),
    (21, "BE", "BELGIUM", "Belgium", "BEL", 56, 32),
    (30, "BR", "BRAZIL", "Brazil", "BRA", 76, 55),
    (38, "CA", "CANADA", "Canada", "CAN", 124, 1),
    (44, "CL", "CHILE", "Chile", "CHL", 152, 56),
    (45, "CN", "CHINA", "China", "CHN", 156, 86),
    (55, "HR", "CROATIA", "Croatia", "HRV", 191, 385),
    (57, "CY", "CYPRUS", "Cyprus", "CYP", 196, 357),
    (58, "CZ", "CZECH REPUBLIC", "Czech Republic", "CZE", 203, 420),
    (59, "DK", "DENMARK", "Denmark", "DNK", 208, 45),
    (8, "AQ", "ANTARCTICA", "Antarctica", None, None, 0),
    (66, "EE", "ESTONIA", "Estonia", "EST", 233, 372),
    (70, "FI", "FINLAND", "Finland", "FIN", 246, 358),
    (71, "FR", "FRANCE", "France", "FRA", 250, 33),
    (78, "DE", "GERMANY", "Germany", "DEU", 276, 49),
    (80, "GR", "GREECE", "Greece", "GRC", 300, 30),
    (92, "HK", "HONG KONG", "Hong Kong", "HKG", 344, 852),
    (93, "HU", "HUNGARY", "Hungary", "HUN", 348, 36),
    (94, "IS", "ICELAND", "Iceland", "ISL", 352, 354),
    (95, "IN", "INDIA", "India", "IND", 356, 91),
    (96, "ID", "INDONESIA", "Indonesia", "IDN", 360, 62),
    (99, "IE", "IRELAND", "Ireland", "IRL", 372, 353),
    (100, "IL", "ISRAEL", "Israel", "ISR", 376, 972),
    (101, "IT", "ITALY", "Italy", "ITA", 380, 39),
    (103, "JP", "JAPAN", "Japan", "JPN", 392, 81),
    (113, "LB", "LEBANON", "Lebanon", "LBN", 422, 961),
    (117, "LT", "LITHUANIA", "Lithuania", "LTU", 440, 370),
    (118, "LU", "LUXEMBOURG", "Luxembourg", "LUX", 442, 352),
    (128, "MT", "MALTA", "Malta", "MLT", 470, 356),
    (139, "NL", "NETHERLANDS", "Netherlands", "NLD", 528, 31),
    (148, "NO", "NORWAY", "Norway", "NOR", 578, 47),
    (162, "PL", "POLAND", "Poland", "POL", 616, 48),
    (163, "PT", "PORTUGAL", "Portugal", "PRT", 620, 351),
    (175, "SA", "SAUDI ARABIA", "Saudi Arabia", "SAU", 682, 966),
    (180, "SG", "SINGAPORE", "Singapore", "SGP", 702, 65),
    (181, "SK", "SLOVAKIA", "Slovakia", "SVK", 703, 421),
    (190, "ZA", "SOUTH AFRICA", "South Africa", "ZAF", 710, 27),
    (192, "ES", "SPAIN", "Spain", "ESP", 724, 34),
    (199, "SE", "SWEDEN", "Sweden", "SWE", 752, 46),
    (200, "CH", "SWITZERLAND", "Switzerland", "CHE", 756, 41),
    (209, "TH", "THAILAND", "Thailand", "THA", 764, 66),
    (219, "AE", "UNITED ARAB EMIRATES", "United Arab Emirates", "ARE", 784, 971),
    (220, "GB", "UNITED KINGDOM", "United Kingdom", "GBR", 826, 44),
    (221, "US", "UNITED STATES", "United States", "USA", 840, 1),
]


def build_country_seed(spark: SparkSession) -> DataFrame:
    """LocalRelation insert (S8) + the composed ALTER semantics:
    drop ``id``/``name`` (S9), rename ``nicename``→``name`` (S10)."""
    raw = spark.createDataFrame(COUNTRY_ROWS, COUNTRY_SEED_RAW)
    return raw.drop("id", "name").withColumnRenamed("nicename", "name")
