"""N-Triples escaping: writer ECHAR-escapes control characters, reader
decodes ECHAR + \\uXXXX/\\UXXXXXXXX (the full grammar Jena decodes;
reference reads NT through RIOT — core:data/formats/JenaLang.scala).

Before this fix a literal containing a newline broke the line-oriented
file on export, and legal escaped input (\\n, \\u0041) was read back with
the escape sequences still raw.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rdfrules_spark.sources.rdf import _nt_unescape_str

_ECHAR_OUT = {
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r",
    "\t": "\\t", "\b": "\\b", "\f": "\\f",
}


def _py_escape(s: str) -> str:
    """Driver-side mirror of the writer's JVM escape chain."""
    return "".join(_ECHAR_OUT.get(ch, ch) for ch in s)


text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@given(text)
@settings(max_examples=300, deadline=None)
def test_escape_then_unescape_is_identity(s):
    assert _nt_unescape_str(_py_escape(s)) == s


@given(st.text(alphabet=st.characters(
    blacklist_categories=("Cs",), blacklist_characters="\\"), max_size=80))
@settings(max_examples=100, deadline=None)
def test_unescape_without_backslash_is_identity(s):
    assert _nt_unescape_str(s) == s


@given(st.integers(min_value=0, max_value=0x10FFFF).filter(
    lambda c: not 0xD800 <= c <= 0xDFFF))
@settings(max_examples=100, deadline=None)
def test_numeric_escapes_decode(cp):
    assert _nt_unescape_str(f"\\u{cp:04X}" if cp <= 0xFFFF
                            else f"\\U{cp:08X}") == chr(cp)


def test_unknown_escape_passes_through_leniently():
    assert _nt_unescape_str("\\x") == "\\x"
    assert _nt_unescape_str("a\\\\n") == "a\\n"  # escaped backslash + n


ADVERSARIAL = [
    "line\nbreak", "carriage\rreturn", "tab\there", 'quo"te',
    "back\\slash", "mixed \\n stays", "café 中文",
    "end with backslash\\", "\t\n\r\b\f", "plain",
]


def test_write_read_nt_roundtrip_adversarial(spark, tmp_path):
    rows = [(f"http://s/{i}", "http://p", lit)
            for i, lit in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    from rdfrules_spark.sources.rdf import read_nt, write_nt

    path = str(tmp_path / "out.nt")
    write_nt(df, path)
    # every written line is a single physical line (nothing raw broke out)
    lines = [ln for ln in spark.read.text(path).collect()]
    assert len(lines) == len(ADVERSARIAL)
    back = read_nt(spark, path)
    got = {(r["s"], r["o"]) for r in back.collect()}
    want = {(s, o) for s, _p, o in rows}
    assert got == want


def test_read_nt_decodes_spec_escapes(spark, tmp_path):
    p = tmp_path / "in.nt"
    p.write_text(
        '<http://a> <http://p> "\\u0041\\tB\\nC" .\n'
        '<http://a> <http://q> "\\U0001F600" .\n'
    )
    from rdfrules_spark.sources.rdf import read_nt

    rows = {(r["p"], r["o"]) for r in read_nt(spark, str(p)).collect()}
    assert rows == {
        ("http://p", "A\tB\nC"),
        ("http://q", "\U0001F600"),
    }


def test_write_read_nq_roundtrip(spark, tmp_path):
    rows = [("http://s", "http://p", "multi\nline \\ lit", "http://g")]
    df = spark.createDataFrame(rows, "s string, p string, o string, g string")
    from rdfrules_spark.sources.rdf import read_nq, write_nq

    path = str(tmp_path / "out.nq")
    write_nq(df, path)
    back = read_nq(spark, path)
    assert [(r["s"], r["p"], r["o"], r["g"]) for r in back.collect()] == rows
