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
        T.StructField("hyphenated", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# ISBN hyphenation (the RangeMessage trie, StandardNumber.java:56-309)
#
# Registration groups and registrant ranges from the publicly documented
# ISBN structure (ISO 2108 / isbn-international.org).  This ships the
# classic ranges for the major 978 groups (0/1 English, 2 French,
# 3 German); numbers in groups without a range table are returned
# unhyphenated rather than guessed — same honest-fallback behavior as an
# out-of-date RangeMessage file.
# ---------------------------------------------------------------------------

# group → [(lo, hi, registrant_len)] over the zero-padded 7-digit
# registrant keyspace
_ISBN_RANGES_978: dict[str, list[tuple[int, int, int]]] = {
    "0": [
        (0, 1999999, 2), (2000000, 6999999, 3), (7000000, 8499999, 4),
        (8500000, 8999999, 5), (9000000, 9499999, 6), (9500000, 9999999, 7),
    ],
    "1": [
        (0, 999999, 2), (1000000, 3999999, 3), (4000000, 5499999, 4),
        (5500000, 8697999, 5), (8698000, 9989999, 6), (9990000, 9999999, 7),
    ],
    "2": [
        (0, 1999999, 2), (2000000, 3499999, 3), (3500000, 3999999, 5),
        (4000000, 6999999, 3), (7000000, 8399999, 4), (8400000, 8999999, 5),
        (9000000, 9499999, 6), (9500000, 9999999, 7),
    ],
    "3": [
        (0, 299999, 2), (300000, 339999, 3), (340000, 369999, 4),
        (370000, 399999, 5), (400000, 1999999, 2), (2000000, 6999999, 3),
        (7000000, 8499999, 4), (8500000, 8999999, 5), (9000000, 9499999, 6),
        (9500000, 9999999, 7),
    ],
}

# valid registration-group prefixes by length (public group allocation)
_GROUPS_978 = {
    1: {"0", "1", "2", "3", "4", "5", "7"},
    2: {str(i) for i in range(80, 95)},
    3: {str(i) for i in range(600, 650)} | {str(i) for i in range(950, 990)},
    4: {str(i) for i in range(9900, 9990)},
    5: {str(i) for i in range(99900, 100000)},
}
_GROUPS_979 = {1: {"8"}, 2: {"10", "11", "12"}}


def hyphenate_isbn13(isbn13: str | None) -> str | None:
    """``9783161484100`` → ``978-3-16-148410-0`` when the group's
    registrant ranges are known; None otherwise (honest fallback)."""
    if not isbn13 or len(isbn13) != 13 or not isbn13.isdigit():
        return None
    prefix, rest, check = isbn13[:3], isbn13[3:12], isbn13[12]
    groups = _GROUPS_978 if prefix == "978" else _GROUPS_979 if prefix == "979" else None
    if groups is None:
        return None
    group = None
    for glen in sorted(groups):
        if rest[:glen] in groups[glen]:
            group = rest[:glen]
            break
    if group is None:
        return None
    ranges = _ISBN_RANGES_978.get(group) if prefix == "978" else None
    if not ranges:
        return None
    rest2 = rest[len(group):]
    key7 = int((rest2 + "0000000")[:7])
    for lo, hi, rlen in ranges:
        if lo <= key7 <= hi:
            reg, pub = rest2[:rlen], rest2[rlen:]
            if not pub:
                return None
            return f"{prefix}-{group}-{reg}-{pub}-{check}"
    return None


def _isbn10_check(digits9: str) -> str:
    s = sum((10 - i) * int(c) for i, c in enumerate(digits9))
    r = (11 - s % 11) % 11
    return "X" if r == 10 else str(r)


def _isbn13_check(digits12: str) -> str:
    s = sum(int(c) * (3 if i % 2 else 1) for i, c in enumerate(digits12))
    return str((10 - s % 10) % 10)


def isbn_parse(raw: str | None) -> tuple[bool, str | None, list[str], str | None]:
    """Validate ISBN-10/13; preferred = ISBN-13 form, variants = both,
    hyphenated = range-trie hyphenation of the preferred form (None when
    the group's ranges aren't shipped)."""
    if not raw:
        return False, None, [], None
    v = _CLEAN.sub("", raw).upper()
    if re.fullmatch(r"\d{9}[\dX]", v):
        if _isbn10_check(v[:9]) != v[9]:
            return False, None, [], None
        core = "978" + v[:9]
        isbn13 = core + _isbn13_check(core)
        return True, isbn13, [v, isbn13], hyphenate_isbn13(isbn13)
    if re.fullmatch(r"\d{13}", v):
        if _isbn13_check(v[:12]) != v[12]:
            return False, None, [], None
        variants = [v]
        if v.startswith("978"):
            nine = v[3:12]
            variants.append(nine + _isbn10_check(nine))
        return True, v, variants, hyphenate_isbn13(v)
    return False, None, [], None


def issn_parse(raw: str | None) -> tuple[bool, str | None, list[str], str | None]:
    """Validate ISSN (mod-11); preferred = NNNN-NNNC."""
    if not raw:
        return False, None, [], None
    v = _CLEAN.sub("", raw).upper()
    if not re.fullmatch(r"\d{7}[\dX]", v):
        return False, None, [], None
    s = sum((8 - i) * int(c) for i, c in enumerate(v[:7]))
    r = (11 - s % 11) % 11
    check = "X" if r == 10 else str(r)
    if check != v[7]:
        return False, None, [], None
    pref = f"{v[:4]}-{v[4:]}"
    return True, pref, [pref, v], pref


def zdb_parse(raw: str | None) -> tuple[bool, str | None, list[str], str | None]:
    """Validate a ZDB id ``digits-check`` (mod 11, weights 2..; check may
    be X) and normalize to ``digits-check`` (function/ZDB.java)."""
    if not raw:
        return False, None, [], None
    v = _CLEAN.sub("", raw).upper().replace("-", "")
    m = re.fullmatch(r"(\d+)([\dX])", v)
    if not m:
        return False, None, [], None
    body, check = m.groups()
    s = sum(int(c) * (i + 2) for i, c in enumerate(reversed(body)))
    r = s % 11
    want = "X" if r == 10 else str(r)
    if want != check:
        return False, None, [], None
    pref = f"{body}-{check}"
    return True, pref, [pref, body + check], pref


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
                "hyphenated": out.map(lambda t: t[3]),
            }
        )

    return udf
