"""The reference's OWN transformation fixture→golden corpus, run through
the event-driven Metamorph engine and compared byte-for-byte.

The reference pins its transform semantics with fixture→golden tests:
``TransformationTestSuite.java:21-36`` auto-discovers every directory
under ``src/test/resources/transformation``, runs each ``input/*.xml``
MARCXML fixture through the institution's rule set
(``src/main/resources/transformation/<ISIL>.xml``) and compares the
JsonEncoder output event-by-event against ``reference.xml/*.json``
(``TransformationTestCase.java:73-128``).  This suite is the same
corpus driven end-to-end through :mod:`limetrans_spark.functions.morph`
— full byte equality of the pretty-printed JSON, which subsumes the
reference's event-level comparison.

Skips cleanly when the reference checkout is not present (the corpus is
reference data, not repo data); `test_morph.py` keeps standalone
engine coverage.
"""

from pathlib import Path

import pytest

from limetrans_spark.functions.morph import (
    Morph,
    events_to_obj,
    marcxml_record_events,
    obj_to_jackson,
)

REF = Path("/root/reference/main/src")
TEST_ROOT = REF / "test/resources/transformation"
RULES_ROOT = REF / "main/resources/transformation"

pytestmark = pytest.mark.skipif(
    not TEST_ROOT.is_dir(), reason="reference transformation corpus not present"
)


def _cases():
    out = []
    if not TEST_ROOT.is_dir():
        return out
    for inst in sorted(TEST_ROOT.iterdir()):
        rules = RULES_ROOT / f"{inst.name}.xml"
        ref_dir = inst / "reference.xml"
        if not (rules.exists() and ref_dir.is_dir()):
            continue
        for golden in sorted(ref_dir.glob("*.json")):
            out.append((inst.name, golden.stem))
    return out


_MORPHS: dict[str, Morph] = {}


def _morph(isil: str) -> Morph:
    if isil not in _MORPHS:
        _MORPHS[isil] = Morph.from_file(RULES_ROOT / f"{isil}.xml")
    return _MORPHS[isil]


@pytest.mark.parametrize("isil,case", _cases())
def test_golden_byte_equal(isil, case):
    morph = _morph(isil)
    xml = (TEST_ROOT / isil / "input" / f"{case}.xml").read_text(encoding="utf-8")
    want = (TEST_ROOT / isil / "reference.xml" / f"{case}.json").read_text(
        encoding="utf-8"
    )
    got = "\n".join(
        obj_to_jackson(events_to_obj(morph.run(events)))
        for _rid, events in marcxml_record_events(xml)
    ) + "\n"
    assert got == want, f"{isil}/{case}: engine output diverges from golden"


def test_corpus_is_nontrivial():
    """The suite must cover every institution with a Metamorph rule set
    (5 in the reference checkout) and a meaningful case count."""
    cases = _cases()
    assert len({i for i, _ in cases}) >= 5
    assert len(cases) >= 48


def test_every_production_ruleset_parses():
    """Vocabulary-coverage pin: EVERY production entry rule set in the
    reference — including the ones without golden fixtures
    (DE-107-ebooks, DE-69, DE-380, DE-709, DE-2524, alma.xml with its
    556 data rules / 150 flush listeners riding macros.xml +
    xi:includes) — must compile without hitting the parse-time
    unsupported-vocabulary guard.  A real reference user's rule file
    loads, or we find out here, not in production."""
    import glob

    files = sorted(glob.glob(str(RULES_ROOT / "*.xml")))
    assert len(files) >= 10
    sizes = {}
    for f in files:
        m = Morph.from_file(f)
        sizes[Path(f).stem] = len(m.registry)
    # the non-empty entry files all carry hundreds of data rules
    assert sizes["alma"] >= 500
    assert sizes["DE-836"] >= 400
    # DE-708-deposit is genuinely an empty ruleset in the reference
    assert sizes["DE-708-deposit"] == 0
