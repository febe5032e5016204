#!/usr/bin/env python
"""Run the reference's transformation fixture→golden corpus through the
morph engine and report per-case byte equality.

Usage: python tools/golden_check.py [ISIL ...] [-v] [case-substring]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from limetrans_spark.functions.morph import (  # noqa: E402
    Morph, marcxml_record_events, events_to_obj, obj_to_jackson,
)

REF = Path("/root/reference/main/src")
TEST_ROOT = REF / "test/resources/transformation"
RULES_ROOT = REF / "main/resources/transformation"


def run_case(morph: Morph, input_file: Path) -> str:
    chunks = []
    for _rid, events in marcxml_record_events(input_file.read_text(encoding="utf-8")):
        pairs = morph.run(events)
        chunks.append(obj_to_jackson(events_to_obj(pairs)))
    return "\n".join(chunks) + "\n"


def main(argv):
    verbose = "-v" in argv
    argv = [a for a in argv if a != "-v"]
    isils = [a for a in argv if a.startswith("DE-")] or sorted(
        d.name for d in TEST_ROOT.iterdir()
        if d.is_dir() and (RULES_ROOT / f"{d.name}.xml").exists()
    )
    case_filter = next((a for a in argv if not a.startswith("DE-")), None)

    total = passed = 0
    for isil in isils:
        rules = RULES_ROOT / f"{isil}.xml"
        try:
            morph = Morph.from_file(rules)
        except Exception as e:
            print(f"[{isil}] PARSE FAIL: {e}")
            total += 1
            continue
        ref_dir = TEST_ROOT / isil / "reference.xml"
        in_dir = TEST_ROOT / isil / "input"
        if not ref_dir.is_dir():
            continue
        for golden in sorted(ref_dir.glob("*.json")):
            case = golden.stem
            if case_filter and case_filter.lower() not in case.lower():
                continue
            input_file = in_dir / f"{case}.xml"
            total += 1
            try:
                got = run_case(morph, input_file)
            except Exception as e:
                print(f"[{isil}] {case}: ERROR {type(e).__name__}: {e}")
                continue
            want = golden.read_text(encoding="utf-8")
            if got == want:
                passed += 1
                if verbose:
                    print(f"[{isil}] {case}: OK")
            else:
                print(f"[{isil}] {case}: DIFF")
                if verbose:
                    import difflib
                    for line in list(difflib.unified_diff(
                            want.splitlines(), got.splitlines(),
                            "golden", "engine", lineterm=""))[:60]:
                        print("   " + line)
    print(f"== {passed}/{total} cases byte-equal ==")
    return 0 if passed == total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
