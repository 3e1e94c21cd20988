"""Full-specification Turtle / TriG parser (W3C Turtle 1.1 grammar).

Replaces the round-2 subset reader (sources/rdf.read_ttl): this parser
covers the complete statement grammar the reference gets from Jena RIOT
(core:data/formats/JenaLang.scala) —

  * ``@prefix`` / ``@base`` AND SPARQL-style ``PREFIX`` / ``BASE``
    directives, ANYWHERE in the document, with correct sequential
    semantics (a prefix applies to statements AFTER its declaration and
    can be redeclared; the round-2 reader's first-2000-lines sniff is
    gone),
  * prefixed names with PN_LOCAL escapes (``\\~`` …) and ``%XX`` PLX,
  * relative-IRI resolution against the current ``@base`` (RFC 3986 via
    urllib.parse.urljoin),
  * all four string forms (``'…'``, ``"…"``, ``'''…'''``, ``\"\"\"…\"\"\"``)
    with ECHAR and ``\\uXXXX`` / ``\\UXXXXXXXX`` escapes, language tags and
    ``^^`` datatypes,
  * numeric (integer / decimal / double) and boolean literals,
  * ``a``, ``;`` predicate lists, ``,`` object lists,
  * blank-node property lists ``[ … ]`` (nested) and ANON ``[]``,
  * collections ``( … )`` -> rdf:first / rdf:rest / rdf:nil chains,
  * TriG graph blocks: ``{ … }`` (default graph), ``<g> { … }``,
    ``GRAPH <g> { … }``, plus plain Turtle statements outside blocks.

Term encoding matches the repo's TSV/NT conventions (sources/tsv.py,
sources/rdf._decode_term): IRIs bare (no angle brackets), blank nodes keep
the ``_:`` sigil (generated anonymous nodes use ``_:!b{n}`` + a per-file
salt — ``!`` is outside the BLANK_NODE_LABEL alphabet, so generated labels
can never collide with explicit ones), literals keep their decoded lexical
form with language/datatype tags dropped (the reference's ParsedLiterals
keeps the typed VALUE, core:data/formats/Tsv.scala:15-120).

Scale note: Turtle is a stateful, sequential format — Jena RIOT streams one
file on one thread, and so do we: the Spark parallelism unit is the FILE
(``spark.read.text(path, wholetext=True)``; a directory of TTL files parses
fully parallel, one giant file is one task). Bulk cluster-scale data should
use the line-parallel NT/NQ/TSV readers — the same guidance the reference
gives.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

# PN_CHARS_BASE approximated as ASCII letters + all non-ASCII (the W3C set
# is a union of unicode blocks; every codepoint >= 0xC0 used in practice is
# inside it, and Jena accepts the same documents).
_PN_BASE = r"A-Za-z\u00C0-\uFFFF"
_PN_CHARS = _PN_BASE + r"0-9_\-\u00B7"
# one PN_LOCAL atom: plain char, ':', %XX, or \-escape
_PLX = r"%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]"

_TOKEN = re.compile(
    r"""
  (?P<WS>\s+|\#[^\n\r]*)
| (?P<IRIREF><(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
| (?P<DIR_PREFIX>@prefix(?=[\s<]))
| (?P<DIR_BASE>@base(?=[\s<]))
| (?P<STRING>
      \"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"
    | '''(?:[^'\\]|\\.|'(?!''))*'''
    | \"(?:[^"\\\n\r]|\\.)*\"
    | '(?:[^'\\\n\r]|\\.)*'
  )
| (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
| (?P<DOUBLE>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+))
| (?P<DECIMAL>[+-]?\d*\.\d+)
| (?P<INTEGER>[+-]?\d+)
| (?P<HATHAT>\^\^)
| (?P<BNODE>_:[""" + _PN_BASE + r"""0-9_](?:[.""" + _PN_CHARS + r"""]*[""" + _PN_CHARS + r"""])?)
| (?P<PNAME>
      (?:[""" + _PN_BASE + r"""](?:[.""" + _PN_CHARS + r"""]*[""" + _PN_CHARS + r"""])?)?:
      (?:(?:[""" + _PN_CHARS.replace(r"\-", "") + r""":_\-]|""" + _PLX + r""")
         (?:[.:""" + _PN_CHARS + r"""]|""" + _PLX + r""")*)?
  )
| (?P<KEYWORD>[A-Za-z]+)
| (?P<PUNCT>[.;,\[\]()\{\}])
""",
    re.X,
)

_ECHAR = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESCAPE_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.S)


def _unescape(s: str, uchar_only: bool = False) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "u" and len(e) == 5:
            return chr(int(e[1:], 16))
        if e[0] == "U" and len(e) == 9:
            return chr(int(e[1:], 16))
        if uchar_only:
            raise ValueError(f"illegal escape '\\{e}' in IRI")
        if e in _ECHAR:
            return _ECHAR[e]
        raise ValueError(f"illegal string escape '\\{e}'")

    return _ESCAPE_RE.sub(sub, s)


_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


def tokenize(text: str):
    """Yield (kind, value, pos) tokens; raises ValueError on garbage."""
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN.match(text, i)
        if m is None:
            raise ValueError(
                f"turtle: unexpected character {text[i]!r} at offset {i}: "
                f"...{text[max(0, i - 40):i + 40]!r}..."
            )
        kind = m.lastgroup
        val = m.group()
        # a PNAME/BNODE may not end with '.' — give trailing dots back to
        # the stream (they are statement terminators)
        if kind in ("PNAME", "BNODE"):
            while val.endswith("."):
                val = val[:-1]
            if not val or (kind == "BNODE" and val == "_:"):
                raise ValueError(f"turtle: bad name at offset {i}")
        i = m.start() + len(val) if kind in ("PNAME", "BNODE") else m.end()
        if kind != "WS":
            yield kind, val, m.start()
    yield "EOF", "", n


class _Parser:
    """Recursive-descent Turtle/TriG statement parser. One instance per
    document; emits (s, p, o, g) tuples via self.out."""

    def __init__(self, text: str, salt: str = "", trig: bool = False):
        self.toks = list(tokenize(text))
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.salt = salt
        self.n_anon = 0
        self.trig = trig
        self.graph = ""
        self.out: list[tuple[str, str, str, str]] = []

    # --- token plumbing ---------------------------------------------------
    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect_punct(self, ch: str):
        k, v, p = self.next()
        if k != "PUNCT" or v != ch:
            raise ValueError(f"turtle: expected '{ch}' at offset {p}, got {v!r}")

    def fail(self, what: str):
        k, v, p = self.peek()
        raise ValueError(f"turtle: expected {what} at offset {p}, got {v!r}")

    # --- term construction --------------------------------------------------
    def _iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1], uchar_only=True)
        if self.base:
            return urljoin(self.base, iri)
        return iri

    def _pname(self, raw: str) -> str:
        pfx, local = raw.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"turtle: undeclared prefix '{pfx}:'")
        return self.prefixes[pfx] + _LOCAL_ESC_RE.sub(r"\1", local)

    def _new_bnode(self) -> str:
        self.n_anon += 1
        return f"_:!b{self.n_anon}{self.salt}"

    def _string(self, raw: str) -> str:
        if raw[:3] in ('"""', "'''"):
            body = raw[3:-3]
        else:
            body = raw[1:-1]
        return _unescape(body)

    # --- grammar ------------------------------------------------------------
    def parse(self):
        while True:
            k, v, p = self.peek()
            if k == "EOF":
                return
            if k == "DIR_PREFIX":
                self.next()
                self._prefix_decl(sparql=False)
            elif k == "DIR_BASE":
                self.next()
                self._base_decl(sparql=False)
            elif k == "KEYWORD" and v.lower() == "prefix":
                self.next()
                self._prefix_decl(sparql=True)
            elif k == "KEYWORD" and v.lower() == "base":
                self.next()
                self._base_decl(sparql=True)
            elif self.trig and k == "PUNCT" and v == "{":
                self._wrapped_graph("")
            elif self.trig and k == "KEYWORD" and v.upper() == "GRAPH":
                self.next()
                self._wrapped_graph(self._graph_label())
            elif self.trig and self._starts_labeled_block():
                self._wrapped_graph(self._graph_label())
            else:
                self._triples()
                self.expect_punct(".")

    def _prefix_decl(self, sparql: bool):
        k, v, p = self.next()
        if k != "PNAME" or not v.endswith(":") or ":" in v[:-1]:
            raise ValueError(f"turtle: bad @prefix name at offset {p}")
        pfx = v[:-1]
        k2, v2, p2 = self.next()
        if k2 != "IRIREF":
            raise ValueError(f"turtle: @prefix needs an IRI at offset {p2}")
        self.prefixes[pfx] = self._iri(v2)
        if not sparql:
            self.expect_punct(".")

    def _base_decl(self, sparql: bool):
        k, v, p = self.next()
        if k != "IRIREF":
            raise ValueError(f"turtle: @base needs an IRI at offset {p}")
        self.base = self._iri(v)
        if not sparql:
            self.expect_punct(".")

    def _graph_label(self) -> str:
        k, v, p = self.peek()
        if k == "IRIREF":
            self.next()
            return self._iri(v)
        if k == "PNAME":
            self.next()
            return self._pname(v)
        if k == "BNODE":
            self.next()
            return v
        self.fail("graph label")

    def _starts_labeled_block(self) -> bool:
        k, v, _ = self.peek()
        if k not in ("IRIREF", "PNAME", "BNODE"):
            return False
        k2, v2, _ = self.toks[self.pos + 1]
        return k2 == "PUNCT" and v2 == "{"

    def _wrapped_graph(self, label: str):
        prev = self.graph
        self.graph = label
        self.expect_punct("{")
        while True:
            k, v, _ = self.peek()
            if k == "PUNCT" and v == "}":
                self.next()
                break
            self._triples()
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ".":
                self.next()
            elif not (k == "PUNCT" and v == "}"):
                self.fail("'.' or '}'")
        self.graph = prev

    def _triples(self):
        k, v, _ = self.peek()
        if k == "PUNCT" and v == "[":
            subj = self._bnode_property_list()
            k, v, _ = self.peek()
            # blankNodePropertyList may stand alone as a statement
            if not (k == "PUNCT" and v in ".}") and k != "EOF":
                self._predicate_object_list(subj)
        elif k == "PUNCT" and v == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)

    def _subject(self) -> str:
        k, v, _ = self.peek()
        if k == "IRIREF":
            self.next()
            return self._iri(v)
        if k == "PNAME":
            self.next()
            return self._pname(v)
        if k == "BNODE":
            self.next()
            return v
        self.fail("subject")

    def _verb(self) -> str:
        k, v, _ = self.peek()
        if k == "KEYWORD" and v == "a":
            self.next()
            return RDF_TYPE
        if k == "IRIREF":
            self.next()
            return self._iri(v)
        if k == "PNAME":
            self.next()
            return self._pname(v)
        self.fail("predicate")

    def _predicate_object_list(self, subj: str):
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ";":
                # swallow repeated ';' and detect end-of-list
                while True:
                    self.next()
                    k, v, _ = self.peek()
                    if not (k == "PUNCT" and v == ";"):
                        break
                if k == "PUNCT" and v in ".}]":
                    return
                if k == "EOF":
                    return
                continue
            return

    def _object_list(self, subj: str, pred: str):
        while True:
            obj = self._object()
            self.out.append((subj, pred, obj, self.graph))
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ",":
                self.next()
                continue
            return

    def _object(self) -> str:
        k, v, p = self.peek()
        if k == "IRIREF":
            self.next()
            return self._iri(v)
        if k == "PNAME":
            self.next()
            return self._pname(v)
        if k == "BNODE":
            self.next()
            return v
        if k == "PUNCT" and v == "[":
            return self._bnode_property_list()
        if k == "PUNCT" and v == "(":
            return self._collection()
        if k == "STRING":
            self.next()
            lex = self._string(v)
            k2, v2, _ = self.peek()
            if k2 == "LANGTAG":
                self.next()
            elif k2 == "HATHAT":
                self.next()
                k3, v3, p3 = self.next()
                if k3 == "IRIREF":
                    self._iri(v3)
                elif k3 == "PNAME":
                    self._pname(v3)
                else:
                    raise ValueError(
                        f"turtle: datatype must be an IRI at offset {p3}"
                    )
            return lex
        if k in ("INTEGER", "DECIMAL", "DOUBLE"):
            self.next()
            return v
        if k == "KEYWORD" and v in ("true", "false"):
            self.next()
            return v
        self.fail("object")

    def _bnode_property_list(self) -> str:
        self.expect_punct("[")
        node = self._new_bnode()
        k, v, _ = self.peek()
        if k == "PUNCT" and v == "]":  # ANON
            self.next()
            return node
        self._predicate_object_list(node)
        self.expect_punct("]")
        return node

    def _collection(self) -> str:
        self.expect_punct("(")
        items = []
        while True:
            k, v, _ = self.peek()
            if k == "PUNCT" and v == ")":
                self.next()
                break
            items.append(self._object())
        if not items:
            return RDF_NIL
        nodes = [self._new_bnode() for _ in items]
        for i, (node, item) in enumerate(zip(nodes, items)):
            self.out.append((node, RDF_FIRST, item, self.graph))
            rest = nodes[i + 1] if i + 1 < len(nodes) else RDF_NIL
            self.out.append((node, RDF_REST, rest, self.graph))
        return nodes[0]


def parse_turtle(text: str, salt: str = "", trig: bool = False):
    """Parse one Turtle/TriG document -> list of (s, p, o, g) tuples
    (g = '' for the default graph; always '' for plain Turtle)."""
    p = _Parser(text, salt=salt, trig=trig)
    p.parse()
    return p.out


def collect_prefixes(text: str) -> tuple[dict, str]:
    """All @prefix/PREFIX declarations and the LAST @base of a document —
    the full-document replacement for the round-2 first-2000-lines sniff
    (companion to the prefix ops in sources/prefixes.py, which manage
    user prefixes independently of the parse)."""
    p = _Parser(text, trig=True)
    try:
        p.parse()
    except ValueError:
        pass  # prefix harvesting tolerates body errors
    return p.prefixes, p.base
