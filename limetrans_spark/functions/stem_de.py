"""Snowball German2 stemmer — the reference's actual stemming filter
(``hbztitle-settings-v8.json:42-45``: ``{"type": "snowball", "language":
"German2"}``, applied in the ``default``/``search`` analyzer chains at
``:124-162`` AFTER ``icu_folding``).

Implemented from the published Snowball algorithm (M. F. Porter,
snowballstem.org, "The German stemming algorithm" + the "German stemmer
variant" German2 note) — a pure function with no state, usable inside
Arrow-batched tokenizers and as a query-side analyzer twin.

The German2 variant differs from standard German only in the prelude:
``ae``/``oe``/``ue`` are treated as equivalent to the umlauted vowels
``ä``/``ö``/``ü`` (folded into them before stemming, and the postlude
strips umlauts back to plain vowels), EXCEPT after ``q`` (``quelle``
must not become ``qülle``) — in the published source this is the
``'qu' (hop 2)`` entry of the prelude ``among``.  Because the
reference's chain runs icu_folding FIRST, the stemmer's input is
already ASCII (``grün`` arrives as ``grun``); German2's prelude is what
makes the unfolded spelling ``gruen`` stem to the same ``grun``.

Algorithm summary (backward-mode steps, longest-match among, no
fallback to shorter suffixes when a region condition fails — standard
Snowball ``[substring] R1 among(...)`` semantics):

* prelude: ß→ss (+ German2 ae/oe/ue folding); ``u``/``y`` between
  vowels are marked as consonants (uppercased).
* R1/R2 as usual (first non-vowel after a vowel), with R1's start
  moved to ≥ 3.
* step 1: ``em ern er`` (R1 → delete) | ``e en es`` (R1 → delete, then
  a trailing ``niss`` loses its last s) | ``s`` after a valid s-ending
  ``bdfghklmnrt`` (R1 → delete).
* step 2: ``en er est`` (R1 → delete) | ``st`` after a valid st-ending
  ``bdfghklmnt`` itself preceded by ≥3 letters (R1 → delete).
* step 3 (d-suffixes): ``end ung`` (R2 → delete, then ``ig`` not after
  ``e`` in R2 → delete) | ``ig ik isch`` (R2, not after ``e`` →
  delete) | ``lich heit`` (R2 → delete, then ``er``/``en`` in R1 →
  delete) | ``keit`` (R2 → delete, then ``lich``/``ig`` in R2 →
  delete).
* postlude: unmark U/Y, strip umlauts ä→a ö→o ü→u.

Test vectors in ``tests/test_stem_de.py`` were hand-executed from the
published specification (this sandbox carries no snowball library or
official diffs.txt to import — noted there).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = set("aeiouyäöü")  # a e i o u y ä ö ü (lowercase only;
# marked U/Y are consonants by construction)
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")

_POSTLUDE = str.maketrans(
    {"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"}
)


def _mark_uy(w: str) -> str:
    """Mark u/y between vowels as consonants (uppercase).  A
    left-to-right scan with replacements in place equals the snowball
    repeat-goto: a marked U/Y kills the vowel context of the next
    position exactly like the consumed cursor does."""
    chars = list(w)
    for j in range(1, len(chars) - 1):
        if chars[j] in "uy" and chars[j - 1] in _VOWELS and chars[j + 1] in _VOWELS:
            chars[j] = chars[j].upper()
    return "".join(chars)


def _fold_scan(w: str, fold_ae_oe_ue: bool) -> str:
    """The prelude's replacement scan: ß→ss always; for German2 also
    ae/oe/ue→ä/ö/ü with the 'qu' (hop 2) exception."""
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        pair = w[i : i + 2]
        if w[i] == "ß":  # ß
            out.append("ss")
            i += 1
        elif fold_ae_oe_ue and pair == "qu":
            # published German2 prelude: 'qu' (hop 2) — qu plus the two
            # following characters pass through untransformed
            out.append(w[i : i + 4])
            i += 4
        elif fold_ae_oe_ue and pair == "ae":
            out.append("ä")
            i += 2
        elif fold_ae_oe_ue and pair == "oe":
            out.append("ö")
            i += 2
        elif fold_ae_oe_ue and pair == "ue":
            out.append("ü")
            i += 2
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


def _prelude(w: str, fold_ae_oe_ue: bool) -> str:
    """German2 marks u/y between vowels FIRST and folds afterwards —
    the marked ``U`` in ``baUen``/``abenteUer`` is what protects a
    native vowel-adjacent ``ue`` from being folded to ``ü`` (only
    consonant-preceded spellings like ``gruen`` fold).  Standard German
    replaces ß first, then marks."""
    if fold_ae_oe_ue:
        return _fold_scan(_mark_uy(w), True)
    return _mark_uy(_fold_scan(w, False))


def _regions(w: str) -> tuple[int, int]:
    """(p1, p2): start offsets of R1 and R2; R1 adjusted to start ≥ 3."""

    def after_vc(start: int) -> int:
        for i in range(start + 1, len(w)):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                return i + 1
        return len(w)

    p1 = after_vc(0)
    p2 = after_vc(p1)
    if len(w) >= 3:
        p1 = max(p1, 3)
    return p1, p2


def _stem_marked(w: str) -> str:
    """Steps 1-3 + postlude on a prelude-processed word."""
    p1, p2 = _regions(w)

    # --- step 1: longest among {ern, em, er, en, es, e, s} ---
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if w.endswith(suf):
            start = len(w) - len(suf)
            if suf in ("em", "ern", "er"):
                if start >= p1:
                    w = w[:start]
            elif suf in ("e", "en", "es"):
                if start >= p1:
                    w = w[:start]
                    if w.endswith("niss"):
                        w = w[:-1]
            else:  # 's'
                if start >= p1 and start >= 1 and w[start - 1] in _S_ENDING:
                    w = w[:start]
            break

    # --- step 2: longest among {est, en, er, st} ---
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            start = len(w) - len(suf)
            if suf == "st":
                # valid st-ending itself preceded by at least 3 letters
                if start >= p1 and start >= 4 and w[start - 1] in _ST_ENDING:
                    w = w[:start]
            else:
                if start >= p1:
                    w = w[:start]
            break

    # --- step 3: d-suffixes ---
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if w.endswith(suf):
            start = len(w) - len(suf)
            if suf in ("end", "ung"):
                if start >= p2:
                    w = w[:start]
                    ig = len(w) - 2
                    if (
                        w.endswith("ig")
                        and ig >= p2
                        and (ig == 0 or w[ig - 1] != "e")
                    ):
                        w = w[:ig]
            elif suf in ("ig", "ik", "isch"):
                if start >= p2 and (start == 0 or w[start - 1] != "e"):
                    w = w[:start]
            elif suf in ("lich", "heit"):
                if start >= p2:
                    w = w[:start]
                    for s2 in ("er", "en"):
                        if w.endswith(s2) and len(w) - 2 >= p1:
                            w = w[:-2]
                            break
            else:  # keit
                if start >= p2:
                    w = w[:start]
                    for s2 in ("lich", "ig"):
                        if w.endswith(s2) and len(w) - len(s2) >= p2:
                            w = w[: len(w) - len(s2)]
                            break
            break

    return w.translate(_POSTLUDE)


@lru_cache(maxsize=1 << 17)
def german2_stem(word: str) -> str:
    """Snowball German2 (the reference's ``snowball_german_umlaut``).

    Memoized: vocabulary repeats massively across a corpus, so the
    per-occurrence cost collapses to a dict hit (pure function)."""
    return _stem_marked(_prelude(word.lower(), fold_ae_oe_ue=True))


def german_stem(word: str) -> str:
    """Standard Snowball German (no ae/oe/ue folding) — kept for the
    variant-discrimination tests; the engine's analyzers use
    :func:`german2_stem`."""
    return _stem_marked(_prelude(word.lower(), fold_ae_oe_ue=False))
