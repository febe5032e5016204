"""Metamorph XML rules → event-driven record transforms.

The reference dispatches transformation rules by extension: ``.fix`` →
Metafix, ``.xml`` → Metamorph (``main/src/main/java/hbz/limetrans/
Limetrans.java:155-189`` — METAMORPH is the required default).  The
Metafix analogue lives in :mod:`functions.fix` (flat) and
:mod:`functions.records` (nested paths); this module implements the
Metamorph IR faithfully enough to reproduce the reference's own
fixture → golden transformation corpus byte-for-byte
(``main/src/test/resources/transformation/<ISIL>/input/*.xml`` vs
``reference.xml/*.json``, auto-discovered by
``TransformationTestSuite.java:21-36`` and compared event-by-event by
``TransformationTestCase.java:73-128``).

Execution model (event-driven, mirroring the public metafacture
Metamorph semantics the reference builds on):

* a MARC record becomes a stream of ``startRecord`` / ``literal`` /
  ``startEntity`` / ``endEntity`` / ``endRecord`` events; datafields
  are entities named ``tag+ind1+ind2``, subfields are literals, the
  flattened path of a subfield is ``"245 0.a"``;
* ``<data>`` elements subscribe to source paths; matches run the
  function chain and deliver the value to the enclosing collector (or
  the record output).  Emissions named ``@…`` re-enter the dispatch
  as named values (internal variables), cascading synchronously;
* collectors (``combine``/``entity``/``choose``/``concat``/``all``/
  ``any``/``none``) hold state and emit either when complete (no
  ``flushWith``) or when flushed.  Flush listeners are registered in
  document order (children before parents) and fire after the named
  value / entity end that matches their ``flushWith`` pattern, or at
  ``endRecord`` for ``record``;
* ``sameEntity="true"`` lazily clears a collector (and resets its
  ``<if>`` condition) whenever it is touched — by a receive *or* a
  flush — from a different entity than the one that filled it;
* ``reset="true"`` clears after every emission.  ``entity`` /
  ``concat`` / ``choose`` drain on emit and stay silent when empty;
  ``combine`` retains its variables unless reset.

``<vars>`` / ``$[var]``, ``<maps>``/``<map>``/``<entry>`` +
``<lookup>``, ``<macros>`` / ``<call-macro>`` (parameter
substitution), ``xi:include`` resolution, ``<if>`` conditions
(``all``/``any``/``none`` trees with their own flush timing), the
``<occurrence>`` / ``<unique>`` stateful functions and the
``<java class="hbz.limetrans.function.ZDB">`` hook are all supported;
anything outside the implemented vocabulary raises at parse time.

Spark-first: the whole transform runs in one Arrow-batched
``mapInPandas`` pass per partition — per-record Java logic in the
reference, per-batch dispatch here.  Zero shuffles; the CPU-per-byte
ceiling of a 100 TB transform job but embarrassingly parallel.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NS = "{http://www.culturegraph.org/metamorph}"
_XI = "{http://www.w3.org/2001/XInclude}"


def _strip(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _compile_source(pattern: str) -> re.Pattern:
    """Metamorph source pattern → regex over flattened paths: ``?`` any
    char, ``*`` any run, ``[...]`` char class, ``|`` alternatives."""
    alts = []
    for alt in pattern.split("|"):
        out, i = "", 0
        while i < len(alt):
            c = alt[i]
            if c == "[":
                j = alt.index("]", i)
                out += "[" + re.escape(alt[i + 1 : j]).replace("\\", "") + "]"
                i = j + 1
            elif c == "?":
                out, i = out + ".", i + 1
            elif c == "*":
                out, i = out + ".*", i + 1
            else:
                out, i = out + re.escape(c), i + 1
        alts.append(out)
    return re.compile("^(?:" + "|".join(alts) + ")$")


# --------------------------------------------------------------------------
# XML loading: xi:include, vars, maps, macros
# --------------------------------------------------------------------------


def _resolve_includes(el: ET.Element, base: Path) -> None:
    """Expand ``xi:include`` children in place (recursively)."""
    for i, child in enumerate(list(el)):
        if child.tag == f"{_XI}include":
            href = child.get("href")
            sub_path = base / href
            sub = ET.fromstring(sub_path.read_text(encoding="utf-8"))
            _resolve_includes(sub, sub_path.parent)
            el.remove(child)
            el.insert(i, sub)
        else:
            _resolve_includes(child, base)


def load_morph_root(path: str | Path) -> ET.Element:
    path = Path(path)
    root = ET.fromstring(path.read_text(encoding="utf-8"))
    _resolve_includes(root, path.parent)
    return root


class _Reject(Exception):
    """A filter function dropped the value."""


_JAVA_POSIX = {
    "Upper": "[A-Z]", "Lower": "[a-z]", "Alpha": "[A-Za-z]",
    "Digit": "[0-9]", "Alnum": "[A-Za-z0-9]", "Space": r"[ \t\n\x0b\f\r]",
    "Punct": r"""[!-/:-@\[-`{-~]""",
}


def _java_regex(pattern: str) -> str:
    """Translate the Java-regex POSIX classes the rule files use
    (``\\p{Upper}`` …) into Python equivalents; everything else is
    shared syntax."""
    return re.sub(
        r"\\p\{(\w+)\}",
        lambda m: _JAVA_POSIX.get(m.group(1), m.group(0)),
        pattern,
    )


# --------------------------------------------------------------------------
# java function hooks (hbz.limetrans.function.*)
# --------------------------------------------------------------------------


def normalize_zdb(value: str) -> str | None:
    """``StandardNumber.Type.ZDB.normalize`` (StandardNumber.java:257-
    274): regex *find* of ``\\b(\\d{2,10})-?([\\dxX])\\b``, mod-11 check
    (weights 2.. from the rightmost body digit, 10 → X), returns
    ``body+CHECK`` unhyphenated or None."""
    m = re.search(r"\b(\d{2,10})-?([\dxX])\b", value or "")
    if not m:
        return None
    body, check = m.group(1), m.group(2).upper()
    s = sum(int(c) * (i + 2) for i, c in enumerate(reversed(body)))
    want = "X" if s % 11 == 10 else str(s % 11)
    return body + check if want == check else None


_JAVA_FUNCS = {
    # ZDB.java:10-13 — empty input → null; null return rejects the value
    "hbz.limetrans.function.ZDB": lambda v: normalize_zdb(v),
}


# --------------------------------------------------------------------------
# functions (the <data> pipeline)
# --------------------------------------------------------------------------


class _Func:
    STATELESS = {
        "trim", "case", "substring", "regexp", "replace", "constant",
        "equals", "not-equals", "lookup", "split", "compose", "java",
        "switch-name-value",
    }
    STATEFUL = {"unique", "occurrence"}

    def __init__(self, kind: str, attrs: dict, maps: dict):
        if kind not in self.STATELESS and kind not in self.STATEFUL:
            raise ValueError(f"unsupported metamorph function <{kind}>")
        self.kind = kind
        self.attrs = attrs
        self.maps = maps
        if kind == "java":
            cls = attrs.get("class")
            if cls not in _JAVA_FUNCS:
                raise ValueError(f"unsupported <java class={cls!r}>")
            self.java = _JAVA_FUNCS[cls]
        if kind == "occurrence":
            only = attrs.get("only", "")
            m = re.fullmatch(r"(lessThan |moreThan )?(\d+)", only)
            if not m:
                raise ValueError(f"unsupported <occurrence only={only!r}>")
            self.occ_mode = (m.group(1) or "exact").strip()
            self.occ_n = int(m.group(2))
            self.occ_same_entity = attrs.get("sameEntity") == "true"

    def apply(self, v: str | None, state: dict, engine) -> list[str]:
        if v is None:
            # a null literal (absent record-type attribute) has no value
            # for any function to transform — drop it
            raise _Reject()
        a = self.attrs
        k = self.kind
        if k == "trim":
            return [v.strip()]
        if k == "case":
            return [v.upper() if a.get("to") == "upper" else v.lower()]
        if k == "substring":
            # metafacture SubString: end == 0 or end > length clamps to
            # length; an impossible start rejects (no emission)
            start = int(a.get("start", "0"))
            end = int(a.get("end", "0"))
            if end == 0 or end > len(v):
                end = len(v)
            if start >= end:
                raise _Reject()  # would be empty → no emission
            return [v[start:end]]
        if k == "regexp":
            m = re.search(_java_regex(a["match"]), v)
            if not m:
                raise _Reject()
            fmt = a.get("format")
            if fmt is None:
                return [m.group(0)]
            return [re.sub(r"\$\{(\d+)\}", lambda g: m.group(int(g.group(1))) or "", fmt)]
        if k == "replace":
            return [re.sub(_java_regex(a["pattern"]), a["with"], v)]
        if k == "constant":
            return [a["value"]]
        if k == "equals":
            if v != a["string"]:
                raise _Reject()
            return [v]
        if k == "not-equals":
            if v == a["string"]:
                raise _Reject()
            return [v]
        if k == "lookup":
            table = self.maps.get(a["in"], {})
            if v in table:
                return [table[v]]
            if "default" in a:
                return [a["default"]]
            raise _Reject()
        if k == "split":
            return [p for p in re.split(a["delimiter"], v) if p]
        if k == "compose":
            return [a.get("prefix", "") + v + a.get("postfix", "")]
        if k == "java":
            out = self.java(v)
            if out is None:
                raise _Reject()
            return [out]
        if k == "unique":
            seen = state.setdefault((id(self), "seen"), set())
            if v in seen:
                raise _Reject()
            seen.add(v)
            return [v]
        if k == "occurrence":
            key = (id(self), "occ")
            cnt, ent = state.get(key, (0, -1))
            if self.occ_same_entity and ent != engine.cur_entity:
                cnt = 0
            cnt += 1
            state[key] = (cnt, engine.cur_entity)
            ok = (
                cnt == self.occ_n if self.occ_mode == "exact"
                else cnt < self.occ_n if self.occ_mode == "lessThan"
                else cnt > self.occ_n
            )
            if not ok:
                raise _Reject()
            return [v]
        raise AssertionError(k)


# --------------------------------------------------------------------------
# runtime nodes
# --------------------------------------------------------------------------

_COLLECT_ATTRS = {
    "name", "value", "flushWith", "reset", "sameEntity", "delimiter",
    "prefix", "postfix",
}


class _Node:
    """Base for data and collectors: receiver plumbing + per-record reset."""

    def __init__(self, engine):
        self.engine = engine
        self.receiver = None  # set by builder: _Sink / collector / _CondShim
        engine.all_nodes.append(self)

    def reset_record(self):
        pass


class _Data(_Node):
    def __init__(self, engine, el: ET.Element, maps: dict, subst):
        super().__init__(engine)
        src = subst(el.get("source"))
        if src is None:
            raise ValueError("<data> without source")
        self.source = src
        name = el.get("name")
        # fixed name when given; otherwise the DISPATCHED path (dynamic —
        # matters for wildcard sources and switch-name-value)
        self.name = subst(name) if name is not None else None
        self.default_name = src  # combine's needed-set key
        self.funcs = []
        self.cond = None
        for c in el:
            kind = _strip(c.tag)
            if kind == "if":
                self.cond = c  # wired by the builder
                continue
            self.funcs.append(
                _Func(kind, {k: subst(v) for k, v in c.attrib.items()}, maps)
            )
        self.cond_met = True
        engine.registry.append((_compile_source(src), self))

    def reset_record(self):
        self.cond_met = self.cond is None

    def on_condition(self):
        self.cond_met = True

    def on_match(self, path: str, value: str):
        if not self.cond_met:
            return
        pairs = [(path, value)]
        state = self.engine.state
        for f in self.funcs:
            if f.kind == "switch-name-value":
                pairs = [(v, n) for n, v in pairs]
                continue
            nxt: list[tuple[str, str]] = []
            for n, v in pairs:
                try:
                    nxt.extend((n, out) for out in f.apply(v, state, self.engine))
                except _Reject:
                    pass
            pairs = nxt
            if not pairs:
                return
        for n, v in pairs:
            self.receiver.receive(self.name if self.name is not None else n, v, self)


class _CondShim:
    """Receiver for an <if> condition subtree: emissions mark the owner's
    condition met (idempotent until the owner resets)."""

    def __init__(self, owner):
        self.owner = owner

    def receive(self, name, value, src):
        self.owner.on_condition()


class _Collect(_Node):
    KIND = "?"

    def __init__(self, engine, el: ET.Element, subst):
        super().__init__(engine)
        known = _COLLECT_ATTRS
        for attr in el.attrib:
            if attr not in known:
                raise ValueError(
                    f"unsupported <{self.KIND} {attr}=…> — flush semantics "
                    "outside the implemented vocabulary must not be ignored"
                )
        self.name = subst(el.get("name"))
        self.reset_after = el.get("reset") == "true"
        self.same_entity = el.get("sameEntity") == "true"
        fw = subst(el.get("flushWith"))
        self.has_cond = False  # builder sets when an <if> is wired
        self.cond_met = True
        self.old_entity = None
        fw = fw if fw is not None else self.default_flush()
        self.wait_for_flush = fw is not None
        self._fw = fw

    def register_flush(self):
        """Called by the builder AFTER children are built — flush
        listeners must fire children-before-parents (document
        post-order), so inner entities land in their parent's buffer
        before the parent itself flushes."""
        fw = self._fw
        if fw is not None:
            pats = [p for p in fw.split("|")]
            self.flush_record = "record" in pats
            rest = [p for p in pats if p != "record"]
            self.flush_pats = [_compile_source("|".join(rest))] if rest else []
            self.engine.flush_regs.append((self.flush_pats, self.flush_record, self))

    # -- subclass policy ----------------------------------------------------
    def default_flush(self) -> str | None:
        return None

    def _receive(self, name, value, src):
        raise NotImplementedError

    def _is_complete(self) -> bool:
        raise NotImplementedError

    def _flush_emits(self) -> bool:
        """Whether a flush may emit in the current (possibly incomplete)
        state."""
        return self._is_complete()

    def _emit(self):
        raise NotImplementedError

    def _clear(self):
        raise NotImplementedError

    # -- shared plumbing ----------------------------------------------------
    def reset_record(self):
        self._clear()
        self.cond_met = not self.has_cond
        self.old_entity = None

    def _reset(self):
        self._clear()
        self.cond_met = not self.has_cond

    def _sync_entity(self):
        ec = self.engine.cur_entity
        if self.old_entity is None:
            self.old_entity = ec
        elif self.old_entity != ec:
            if self.same_entity:
                self._reset()
            self.old_entity = ec

    def on_condition(self):
        self._sync_entity()
        if not self.cond_met:  # only the False→True transition can emit
            self.cond_met = True
            self._try_emit()

    def receive(self, name, value, src):
        self._sync_entity()
        self._receive(name, value, src)
        self._try_emit()

    def _try_emit(self):
        if not self.wait_for_flush and self.cond_met and self._is_complete():
            self._emit()
            if self.reset_after:
                self._reset()

    def flush(self):
        self._sync_entity()
        if self.cond_met and self._flush_emits():
            self._emit()
        if self.reset_after:
            self._reset()


class _Combine(_Collect):
    KIND = "combine"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.template = subst(el.get("value")) or ""
        self.vars: dict[str, str] = {}
        self.needed: set[str] = set()  # child names, filled by builder

    def _receive(self, name, value, src):
        self.vars[name] = value

    def _is_complete(self):
        return self.needed <= self.vars.keys()

    def _flush_emits(self):
        # metafacture flushIncomplete default: flushing an incomplete
        # combine emits with the collected variables (missing ones stay
        # as literal ${var}); an untouched combine stays silent
        return bool(self.vars) or not self.needed

    def _fmt(self, template):
        return re.sub(
            r"\$\{([^}]+)\}",
            lambda m: self.vars.get(m.group(1), m.group(0)),
            template,
        )

    def _emit(self):
        self.receiver.receive(self._fmt(self.name or ""), self._fmt(self.template), self)

    def _clear(self):
        self.vars.clear()


class _Entity(_Collect):
    """Without ``flushWith`` an entity emits when COMPLETE — every
    direct child source has fired since the last clear (pinned by the
    DE-836 ``dateFirst-dateLast`` golden: DateFirst, fed during the 008
    literal, appears in the output BEFORE the record-end-flushed
    facets); with ``flushWith`` it emits, non-empty, at each flush.
    Entities drain on emit."""

    KIND = "entity"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.buf: list[tuple[str, object]] = []
        self.n_children = 0  # set by builder
        self.fired: set[int] = set()

    def default_flush(self):
        return None  # no flushWith → emit on complete

    def receive_tagged(self, idx, name, value, src):
        self._sync_entity()
        self.buf.append((name, value))
        self.fired.add(idx)
        self._try_emit()

    def _receive(self, name, value, src):  # pragma: no cover - via tagged
        self.buf.append((name, value))

    def _is_complete(self):
        return self.n_children > 0 and len(self.fired) >= self.n_children

    def _flush_emits(self):
        return bool(self.buf)

    def _emit(self):
        self.receiver.receive(self.name or "", list(self.buf), self)
        self.buf.clear()  # entities drain on emit
        self.fired.clear()

    def _clear(self):
        self.buf.clear()
        self.fired.clear()


class _Choose(_Collect):
    KIND = "choose"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.best: tuple[int, str, str] | None = None  # (prio, name, value)

    def default_flush(self):
        return "record"

    def receive_tagged(self, prio, name, value, src):
        self._sync_entity()
        if self.best is None or prio <= self.best[0]:
            self.best = (prio, name, value)
        self._try_emit()

    def _receive(self, name, value, src):  # pragma: no cover - via tagged
        self.receive_tagged(1 << 30, name, value, src)

    def _is_complete(self):
        return False

    def _flush_emits(self):
        return self.best is not None

    def _emit(self):
        self.receiver.receive(self.name or self.best[1], self.best[2], self)
        self.best = None  # drains

    def _clear(self):
        self.best = None


class _TaggedReceiver:
    """Routes a choose child's emission with its document-order priority."""

    def __init__(self, choose: _Choose, prio: int):
        self.choose = choose
        self.prio = prio

    def receive(self, name, value, src):
        self.choose.receive_tagged(self.prio, name, value, src)


class _Concat(_Collect):
    KIND = "concat"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.delimiter = subst(el.get("delimiter")) or ""
        self.prefix = subst(el.get("prefix")) or ""
        self.postfix = subst(el.get("postfix")) or ""
        self.parts: list[str] = []

    def default_flush(self):
        return "record"

    def _receive(self, name, value, src):
        self.parts.append(value)

    def _is_complete(self):
        return False

    def _flush_emits(self):
        return bool(self.parts)

    def _emit(self):
        self.receiver.receive(
            self.name or "", self.prefix + self.delimiter.join(self.parts) + self.postfix, self
        )
        self.parts.clear()  # drains

    def _clear(self):
        self.parts.clear()


class _All(_Collect):
    KIND = "all"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.n_children = 0  # set by builder
        self.fired: set[int] = set()

    def receive_tagged(self, idx, name, value, src):
        self._sync_entity()
        self.fired.add(idx)
        self._try_emit()

    def _receive(self, name, value, src):  # pragma: no cover - via tagged
        raise AssertionError

    def _is_complete(self):
        return len(self.fired) >= self.n_children

    def _emit(self):
        self.receiver.receive(self.name or "", "true", self)
        self.fired.clear()  # booleans drain

    def _clear(self):
        self.fired.clear()


class _Any(_All):
    KIND = "any"

    def _is_complete(self):
        return bool(self.fired)


class _None(_Collect):
    KIND = "none"

    def __init__(self, engine, el, subst):
        super().__init__(engine, el, subst)
        self.received = False

    def default_flush(self):
        return "record"

    def _receive(self, name, value, src):
        self.received = True

    def _is_complete(self):
        return False  # only decidable at flush time

    def _flush_emits(self):
        return not self.received

    def _emit(self):
        self.receiver.receive(self.name or "", "true", self)

    def _clear(self):
        self.received = False


class _BoolTaggedReceiver:
    def __init__(self, owner, idx):
        self.owner = owner
        self.idx = idx

    def receive(self, name, value, src):
        self.owner.receive_tagged(self.idx, name, value, src)


class _Sink:
    """Record-level receiver: ``@…`` emissions re-enter the dispatch as
    named values; everything else is output."""

    def __init__(self, engine):
        self.engine = engine

    def receive(self, name, value, src):
        if name.startswith("@"):
            self.engine.dispatch(name, value if isinstance(value, str) else "")
        else:
            self.engine.out.append((name, value))


# --------------------------------------------------------------------------
# engine: compile + run
# --------------------------------------------------------------------------

_COLLECT_KINDS = {
    "combine": _Combine,
    "entity": _Entity,
    "choose": _Choose,
    "concat": _Concat,
    "all": _All,
    "any": _Any,
    "none": _None,
}


class Morph:
    """Compiled Metamorph rule set (event-driven).

    ``run(events)`` maps one record's event list to the ordered output
    pairs the reference's JsonEncoder would serialize; ``events`` is a
    list of ``("literal", name, value)`` / ``("start", name)`` /
    ``("end",)`` tuples.
    """

    def __init__(self):
        self.registry: list[tuple[re.Pattern, _Data]] = []
        self.flush_regs: list[tuple[list[re.Pattern], bool, _Collect]] = []
        self.all_nodes: list[_Node] = []
        self.maps: dict[str, dict[str, str]] = {}
        self.vars: dict[str, str] = {}
        # runtime
        self.out: list = []
        self.state: dict = {}
        self.cur_entity = 0
        self._entity_stack: list[int] = [0]
        self._path_stack: list[str] = []
        self._entity_counter = 0

    # -- parse --------------------------------------------------------------

    @classmethod
    def from_file(cls, path: str | Path, vars_: dict | None = None) -> "Morph":
        return cls._build(load_morph_root(Path(path)), vars_)

    @classmethod
    def from_xml(cls, xml_text: str, vars_: dict | None = None,
                 base_dir: str | Path | None = None) -> "Morph":
        root = ET.fromstring(xml_text)
        _resolve_includes(root, Path(base_dir) if base_dir else Path("."))
        return cls._build(root, vars_)

    @classmethod
    def _build(cls, root: ET.Element, vars_: dict | None) -> "Morph":
        self = cls()
        vars_ = dict(vars_ or {})
        for vs in root.iter(f"{_NS}vars"):
            for v in vs:
                vars_.setdefault(v.get("name"), v.get("value"))
        self.vars = vars_
        for mp in root.iter(f"{_NS}map"):
            self.maps[mp.get("name")] = {
                e.get("name"): e.get("value") for e in mp if _strip(e.tag) == "entry"
            }
        macros: dict[str, ET.Element] = {}
        for mc in root.iter(f"{_NS}macro"):
            macros[mc.get("name")] = mc

        sink = _Sink(self)
        for rules_el in root.iter(f"{_NS}rules"):
            for el in rules_el:
                self._build_rule(el, sink, vars_, macros, top=True)
        return self

    def _subst_fn(self, vars_: dict):
        def subst(s):
            if s is None:
                return None
            return re.sub(
                r"\$\[([^\]]+)\]", lambda m: vars_.get(m.group(1), m.group(0)), s
            )
        return subst

    def _build_rule(self, el: ET.Element, receiver, vars_: dict,
                    macros: dict, top: bool = False):
        """Build one rule element; returns the node (None for call-macro
        splices, which wire themselves)."""
        kind = _strip(el.tag)
        subst = self._subst_fn(vars_)
        if kind == "call-macro":
            name = el.get("name")
            if name not in macros:
                raise ValueError(f"unknown macro {name!r}")
            # metafacture passes ALL call attributes as macro parameters,
            # including "name" itself ($[name] resolves to the macro name)
            params = dict(vars_)
            params.update({k: subst(v) for k, v in el.attrib.items()})
            for child in macros[name]:
                self._build_rule(child, receiver, params, macros)
            return None
        if kind == "data":
            node = _Data(self, el, self.maps, subst)
            node.receiver = receiver
            if node.cond is not None:
                self._wire_condition(node, node.cond, vars_, macros)
                node.cond_met = False
            return node
        if kind in _COLLECT_KINDS:
            node = _COLLECT_KINDS[kind](self, el, subst)
            node.receiver = receiver
            idx = 0
            for child in el:
                ckind = _strip(child.tag)
                if ckind == "if":
                    self._wire_condition(node, child, vars_, macros)
                    node.has_cond = True
                    node.cond_met = False
                    continue
                if kind == "choose":
                    child_recv = _TaggedReceiver(node, idx)
                elif kind in ("all", "any", "entity"):
                    child_recv = _BoolTaggedReceiver(node, idx)
                else:
                    child_recv = node
                built = self._build_rule(child, child_recv, vars_, macros)
                if built is not None or kind not in ("all", "any"):
                    idx += 1
                if kind == "combine" and built is not None:
                    name = getattr(built, "name", None) or getattr(
                        built, "default_name", None
                    )
                    if name:
                        node.needed.add(name)
            if kind in ("all", "any", "entity"):
                node.n_children = idx
            node.register_flush()
            return node
        raise ValueError(f"unsupported metamorph rule <{kind}>")

    def _wire_condition(self, owner, if_el: ET.Element, vars_: dict, macros: dict):
        children = [c for c in if_el]
        if len(children) != 1:
            raise ValueError("<if> must hold exactly one condition")
        shim = _CondShim(owner)
        self._build_rule(children[0], shim, vars_, macros)

    # -- run ----------------------------------------------------------------

    def start_record(self):
        for n in self.all_nodes:
            n.reset_record()
        self.out = []
        self.state = {}
        self.cur_entity = 0
        self._entity_stack = [0]
        self._path_stack = []
        self._entity_counter = 0

    def dispatch(self, path: str, value: str):
        for rx, node in self.registry:
            if rx.match(path):
                node.on_match(path, value)
        for pats, _rec, col in self.flush_regs:
            for rx in pats:
                if rx.match(path):
                    col.flush()
                    break

    def literal(self, name: str, value: str):
        if self._path_stack:
            path = self._path_stack[-1] + "." + name
        else:
            path = name
        self.dispatch(path, value)

    def start_entity(self, name: str):
        self._entity_counter += 1
        self._entity_stack.append(self._entity_counter)
        self.cur_entity = self._entity_counter
        parent = self._path_stack[-1] + "." if self._path_stack else ""
        self._path_stack.append(parent + name)

    def end_entity(self):
        path = self._path_stack[-1]
        self.dispatch(path, "")
        self._path_stack.pop()
        self._entity_stack.pop()
        self.cur_entity = self._entity_stack[-1]

    def end_record(self):
        for _pats, rec, col in self.flush_regs:
            if rec:
                col.flush()

    def run(self, events: list[tuple]) -> list:
        """One record's events → ordered output pairs (may nest)."""
        self.start_record()
        for ev in events:
            op = ev[0]
            if op == "literal":
                self.literal(ev[1], ev[2])
            elif op == "start":
                self.start_entity(ev[1])
            elif op == "end":
                self.end_entity()
            else:
                raise ValueError(f"unknown event {op!r}")
        self.end_record()
        return self.out

    def transform(self, occurrences: list[tuple[str, str]]) -> dict:
        """Compat surface: flat ``(key, value)`` occurrences (``"001"``
        control fields, ``"24510.a"`` subfields; consecutive same-field
        keys form one field instance) → plain dict."""
        events: list[tuple] = []
        open_field = None
        for key, value in occurrences:
            head, dot, code = key.partition(".")
            if dot and len(head) == 5:
                if open_field != head:
                    if open_field is not None:
                        events.append(("end",))
                    events.append(("start", head))
                    open_field = head
                events.append(("literal", code, value))
            else:
                if open_field is not None:
                    events.append(("end",))
                    open_field = None
                events.append(("literal", key, value))
        if open_field is not None:
            events.append(("end",))
        return pairs_to_plain(events_to_obj(self.run(events)))


# --------------------------------------------------------------------------
# MARC event readers
# --------------------------------------------------------------------------


def marcxml_record_events(xml_text: str) -> list[tuple[str | None, list[tuple]]]:
    """MARCXML document → per record ``(record_id, events)`` in document
    order — the event shape the reference's MarcXmlHandler produces
    (leader literal, controlfield literals, datafield entities)."""

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    root = ET.fromstring(xml_text)
    nodes = [root] if local(root.tag) == "record" else [
        el for el in root.iter() if local(el.tag) == "record"
    ]
    out = []
    for rec in nodes:
        rid = None
        events: list[tuple] = []
        # MarcXmlHandler always emits the record's type attribute as the
        # first literal — null-valued when the attribute is absent (the
        # nonull rule set exists to filter exactly this)
        events.append(("literal", "type", rec.get("type")))
        for el in rec:
            name = local(el.tag)
            # MarcXmlHandler trims accumulated character data
            if name == "leader":
                events.append(("literal", "leader", (el.text or "").strip()))
            elif name == "controlfield":
                tag = el.get("tag", "")
                events.append(("literal", tag, (el.text or "").strip()))
                if tag == "001":
                    rid = (el.text or "").strip()
            elif name == "datafield":
                tag = el.get("tag", "")
                ent = tag + el.get("ind1", " ") + el.get("ind2", " ")
                events.append(("start", ent))
                for sf in el:
                    if local(sf.tag) == "subfield":
                        events.append(
                            ("literal", sf.get("code", ""), (sf.text or "").strip())
                        )
                events.append(("end",))
        out.append((rid, events))
    return out


def marc21_record_events(raw: str) -> tuple[str | None, list[tuple]]:
    """One ISO 2709 record → (record_id, events), with real field-
    instance boundaries from the directory."""
    from ..sources.marc import parse_marc21_grouped

    rid, leader, fields = parse_marc21_grouped(raw)
    events: list[tuple] = []
    if leader:
        # Marc21Decoder emits the leader as a structured entity (coded
        # positions as named literals), unlike MarcXmlHandler's single
        # "leader" literal for MARCXML
        events.append(("start", "leader"))
        for name, pos in (
            ("status", 5), ("type", 6), ("bibliographicLevel", 7),
            ("typeOfControl", 8), ("characterCodingScheme", 9),
            ("encodingLevel", 17), ("catalogingForm", 18),
            ("multipartLevel", 19),
        ):
            if pos < len(leader):
                events.append(("literal", name, leader[pos]))
        events.append(("end",))
    for tag, inds, payload in fields:
        if inds is None:
            events.append(("literal", tag, payload))
        else:
            events.append(("start", tag + inds))
            for code, value in payload:
                events.append(("literal", code, value))
            events.append(("end",))
    return rid, events


# --------------------------------------------------------------------------
# output shaping: the reference JsonEncoder's array/object rules
# --------------------------------------------------------------------------


def events_to_obj(pairs: list) -> list:
    """Morph output pairs → pairs tree: ``('obj', [(k, v)…])`` objects /
    ``('arr', [v…])`` arrays, mirroring metafacture JsonEncoder: entity
    names ending in ``[]`` open arrays; inside arrays element names are
    ignored (scalars append, ``…[]`` nests an array, anything else an
    object)."""

    def shape(items: list, in_array: bool):
        if in_array:
            arr = []
            for name, value in items:
                if isinstance(value, list):
                    if name.endswith("[]"):
                        arr.append(shape(value, True))
                    else:
                        arr.append(shape(value, False))
                else:
                    arr.append(value)
            return ("arr", arr)
        obj = []
        for name, value in items:
            if isinstance(value, list):
                if name.endswith("[]"):
                    obj.append((name[:-2], shape(value, True)))
                else:
                    obj.append((name, shape(value, False)))
            else:
                obj.append((name, value))
        return ("obj", obj)

    return shape(pairs, False)


def obj_to_jackson(node, indent: int = 0) -> str:
    """Pairs tree → the Jackson DefaultPrettyPrinter format the
    reference's JsonEncoder (pretty printing on) writes: 2-space
    indent, ``" : "`` separators, arrays inline with object elements
    breaking onto indented lines."""
    pad = "  " * indent
    kind = node[0] if isinstance(node, tuple) else "scalar"
    if kind == "obj":
        items = node[1]
        if not items:
            return "{ }"
        lines = []
        for k, v in items:
            lines.append(
                f'{pad}  {json.dumps(k, ensure_ascii=False)} : '
                f"{obj_to_jackson(v, indent + 1)}"
            )
        return "{\n" + ",\n".join(lines) + "\n" + pad + "}"
    if kind == "arr":
        items = node[1]
        if not items:
            return "[ ]"
        parts = [obj_to_jackson(v, indent) for v in items]
        return "[ " + ", ".join(parts) + " ]"
    return json.dumps(node, ensure_ascii=False)


def pairs_to_plain(node):
    """Pairs tree → plain dict/list (duplicate keys: last wins) — the
    shape handed to downstream Spark operators."""
    kind = node[0] if isinstance(node, tuple) else "scalar"
    if kind == "obj":
        return {k: pairs_to_plain(v) for k, v in node[1]}
    if kind == "arr":
        return [pairs_to_plain(v) for v in node[1]]
    return node


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def _indexer_json(pairs) -> str | None:
    """Morph output events → the reference INDEXER's JSON shaping
    (records.RecordBuilder) — duplicate sibling fields reject the
    record (→ None), mirroring the backend's parse error
    (ElasticsearchIndexerTest.java:180-196)."""
    from .records import DuplicateFieldError, RecordBuilder, to_json_str

    b = RecordBuilder()

    def emit(items):
        for name, value in items:
            if name.startswith("@"):
                continue
            if isinstance(value, list):
                b.start_entity(name)
                emit(value)
                b.end_entity()
            else:
                b.literal(name, value)

    try:
        emit(pairs)
        return to_json_str(b.build())
    except DuplicateFieldError:
        return None


def morph_marc21(spark, paths, xml_text: str, vars_: dict | None = None,
                 base_dir: str | Path | None = None,
                 shaping: str = "json") -> DataFrame:
    """MARC21 stream → ``(record_id, record)`` JSON via a compiled
    Metamorph rule set — one Arrow-batched pass (read + parse +
    transform + serialize fused), the ``.xml`` twin of
    :func:`records.read_marc21_nested`.

    ``shaping="json"`` mirrors the reference's JsonEncoder (duplicate
    keys last-wins in the plain-dict serialization); ``"indexer"``
    applies the indexer's shaping rules and DROPS records with
    duplicate sibling fields, like the reference backend."""
    from ..sources.marc import RT

    raw = (
        spark.read.format("text")
        .option("lineSep", RT)
        .load(paths)
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        morph = Morph.from_xml(xml_text, vars_, base_dir)
        for pdf in batches:
            ids, recs = [], []
            for raw_rec in pdf["value"]:
                rid, events = marc21_record_events(raw_rec)
                pairs = morph.run(events)
                if shaping == "indexer":
                    doc = _indexer_json(pairs)
                    if doc is None:
                        continue  # one bad record must not fail the job
                else:
                    doc = json.dumps(
                        pairs_to_plain(events_to_obj(pairs)),
                        ensure_ascii=False,
                        separators=(",", ":"),
                    )
                ids.append(rid)
                recs.append(doc)
            yield pd.DataFrame({"record_id": ids, "record": recs})

    return raw.mapInPandas(run, "record_id string, record string")


def morph_marcxml(spark, paths, rules_path: str | Path,
                  vars_: dict | None = None) -> DataFrame:
    """MARCXML files → ``(record_id, record)`` JSON via a Metamorph
    rules FILE (xi:includes resolved relative to it)."""
    raw = spark.read.format("text").option("wholetext", True).load(paths)
    rules_path = str(rules_path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        morph = Morph.from_file(rules_path, vars_)
        for pdf in batches:
            ids, recs = [], []
            for xml_doc in pdf["value"]:
                for rid, events in marcxml_record_events(xml_doc):
                    pairs = morph.run(events)
                    ids.append(rid)
                    recs.append(
                        json.dumps(
                            pairs_to_plain(events_to_obj(pairs)),
                            ensure_ascii=False,
                            separators=(",", ":"),
                        )
                    )
            yield pd.DataFrame({"record_id": ids, "record": recs})

    return raw.mapInPandas(run, "record_id string, record string")
