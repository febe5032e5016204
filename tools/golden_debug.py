#!/usr/bin/env python
"""Per-record diff for one fixture case: first N mismatching records with
their input events. Usage: golden_debug.py ISIL CASE [N]"""
import sys
import difflib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from limetrans_spark.functions.morph import (  # noqa: E402
    Morph, marcxml_record_events, events_to_obj, obj_to_jackson,
)

REF = Path("/root/reference/main/src")


def main(isil, case, nshow=1, difflines=40):
    morph = Morph.from_file(REF / f"main/resources/transformation/{isil}.xml")
    xml = (REF / f"test/resources/transformation/{isil}/input/{case}.xml").read_text()
    want = (REF / f"test/resources/transformation/{isil}/reference.xml/{case}.json").read_text()
    golden, cur = [], []
    for line in want.split("\n"):
        cur.append(line)
        if line == "}":
            golden.append("\n".join(cur))
            cur = []
    evs = marcxml_record_events(xml)
    print(f"records: {len(evs)} golden: {len(golden)}")
    bad = 0
    for idx, (rid, events) in enumerate(evs):
        got = obj_to_jackson(events_to_obj(morph.run(events)))
        if got != golden[idx]:
            bad += 1
            if bad <= nshow:
                print(f"== MISMATCH idx {idx} rid {rid!r}")
                for line in list(difflib.unified_diff(
                        golden[idx].splitlines(), got.splitlines(),
                        "golden", "engine", lineterm=""))[:difflines]:
                    print(line)
                print("--- events:")
                for e in events:
                    print("   ", e)
    print("total mismatching records:", bad)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0], a[1], int(a[2]) if len(a) > 2 else 1,
         int(a[3]) if len(a) > 3 else 40)
