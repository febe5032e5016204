"""Standard-number validation/normalization (ISBN / ISSN / ZDB).

Re-implements the semantics of the reference's custom Fix function
``standard_number`` (``main/src/main/java/hbz/limetrans/function/
StandardNumber.java:56-309``): validate the check digit, normalize the
form, emit a preferred representation plus variants (ISBN-10 ↔ ISBN-13
conversion).  Checksum math from the public standards (ISO 2108 /
ISO 3297); ZDB uses the mod-11 scheme of ``function/ZDB.java:5-15``.

Exposed as vectorized pandas UDFs (pure string/checksum arithmetic —
exactly the workload Arrow batching is for).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_CLEAN = re.compile(r"[\s-]+")

RESULT_TYPE = T.StructType(
    [
        T.StructField("valid", T.BooleanType()),
        T.StructField("preferred", T.StringType()),
        T.StructField("variants", T.ArrayType(T.StringType())),
    ]
)


def _isbn10_check(digits9: str) -> str:
    s = sum((10 - i) * int(c) for i, c in enumerate(digits9))
    r = (11 - s % 11) % 11
    return "X" if r == 10 else str(r)


def _isbn13_check(digits12: str) -> str:
    s = sum(int(c) * (3 if i % 2 else 1) for i, c in enumerate(digits12))
    return str((10 - s % 10) % 10)


def isbn_parse(raw: str | None) -> tuple[bool, str | None, list[str]]:
    """Validate ISBN-10/13; preferred = ISBN-13 form, variants = both."""
    if not raw:
        return False, None, []
    v = _CLEAN.sub("", raw).upper()
    if re.fullmatch(r"\d{9}[\dX]", v):
        if _isbn10_check(v[:9]) != v[9]:
            return False, None, []
        core = "978" + v[:9]
        isbn13 = core + _isbn13_check(core)
        return True, isbn13, [v, isbn13]
    if re.fullmatch(r"\d{13}", v):
        if _isbn13_check(v[:12]) != v[12]:
            return False, None, []
        variants = [v]
        if v.startswith("978"):
            nine = v[3:12]
            variants.append(nine + _isbn10_check(nine))
        return True, v, variants
    return False, None, []


def issn_parse(raw: str | None) -> tuple[bool, str | None, list[str]]:
    """Validate ISSN (mod-11); preferred = NNNN-NNNC."""
    if not raw:
        return False, None, []
    v = _CLEAN.sub("", raw).upper()
    if not re.fullmatch(r"\d{7}[\dX]", v):
        return False, None, []
    s = sum((8 - i) * int(c) for i, c in enumerate(v[:7]))
    r = (11 - s % 11) % 11
    check = "X" if r == 10 else str(r)
    if check != v[7]:
        return False, None, []
    pref = f"{v[:4]}-{v[4:]}"
    return True, pref, [pref, v]


def zdb_parse(raw: str | None) -> tuple[bool, str | None, list[str]]:
    """Validate a ZDB id ``digits-check`` (mod 11, weights 2..; check may
    be X) and normalize to ``digits-check`` (function/ZDB.java)."""
    if not raw:
        return False, None, []
    v = _CLEAN.sub("", raw).upper().replace("-", "")
    m = re.fullmatch(r"(\d+)([\dX])", v)
    if not m:
        return False, None, []
    body, check = m.groups()
    s = sum(int(c) * (i + 2) for i, c in enumerate(reversed(body)))
    r = s % 11
    want = "X" if r == 10 else str(r)
    if want != check:
        return False, None, []
    pref = f"{body}-{check}"
    return True, pref, [pref, body + check]


_PARSERS = {"ISBN": isbn_parse, "ISSN": issn_parse, "ZDB": zdb_parse}


def standard_number_udf(kind: str):
    """pandas UDF factory: column of raw strings → struct(valid,
    preferred, variants) for the given standard."""
    parse = _PARSERS[kind.upper()]

    @pandas_udf(RESULT_TYPE)
    def udf(raw: pd.Series) -> pd.DataFrame:
        out = raw.map(parse)
        return pd.DataFrame(
            {
                "valid": out.map(lambda t: t[0]),
                "preferred": out.map(lambda t: t[1]),
                "variants": out.map(lambda t: t[2]),
            }
        )

    return udf
