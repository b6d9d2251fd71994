"""Distributed N-Quads source/sink (sources/nquads.py): round-trip
exactness against the kernel's own serializer/parser, escape and
graph/language handling, error modes, dedup."""
from __future__ import annotations

import os

import pytest

from jsonld_js_spark.kernel import parse_nquads, serialize_nquads
from jsonld_js_spark.pipeline.kernel_path import TRIPLE_SCHEMA
from jsonld_js_spark.sources import read_nquads, write_nquads

EX = "http://example.org/"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

# every term shape the grammar supports: IRIs, bnode subject/object/
# graph, plain/typed/lang literals, the full escape set, named graphs
NASTY_QUADS = [
    (EX + "s", EX + "p", "plain", "Literal", XSD_STRING, None, ""),
    (EX + "s", EX + "p", 'quote " backslash \\ done', "Literal",
     XSD_STRING, None, ""),
    (EX + "s", EX + "p", "tab\there\nnewline\rcr", "Literal",
     XSD_STRING, None, ""),
    (EX + "s", EX + "p", "42", "Literal",
     "http://www.w3.org/2001/XMLSchema#integer", None, ""),
    (EX + "s", EX + "p", "bonjour", "Literal",
     "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", ""),
    (EX + "s", EX + "p", EX + "o", "NamedNode", None, None, ""),
    ("_:b0", EX + "p", "_:b1", "BlankNode", None, None, ""),
    (EX + "s", EX + "p", "in graph", "Literal", XSD_STRING, None,
     EX + "g1"),
    ("_:b0", EX + "p", EX + "o", "NamedNode", None, None, "_:bg"),
    (EX + "s", EX + "p", "unicode é中", "Literal",
     XSD_STRING, None, ""),
]


def _df(spark, quads):
    return spark.createDataFrame(quads, schema=TRIPLE_SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_roundtrip_exact(spark, tmp_path):
    path = str(tmp_path / "nq")
    df = _df(spark, NASTY_QUADS)
    write_nquads(df, path)
    back = read_nquads(spark, path)
    assert _rows(back) == sorted(NASTY_QUADS)


def test_sink_matches_kernel_serializer(spark, tmp_path):
    """The column-expression serializer emits byte-identical lines to
    kernel quad_to_nquad (sorted)."""
    path = str(tmp_path / "nq")
    df = _df(spark, NASTY_QUADS)
    write_nquads(df, path, sort=True)
    lines = []
    for part in sorted(os.listdir(path)):
        if part.startswith("part-"):
            with open(os.path.join(path, part)) as f:
                lines += [ln for ln in f.read().split("\n") if ln]
    assert "\n".join(sorted(lines)) + "\n" == serialize_nquads(NASTY_QUADS)


def test_source_matches_kernel_parser(spark, tmp_path):
    """Distributed parse == kernel parse_nquads on the same text
    (comments and blank lines included)."""
    text = serialize_nquads(NASTY_QUADS)
    text = "# leading comment\n\n" + text + "   \n# trailing\n"
    p = tmp_path / "doc.nq"
    p.write_text(text)
    back = read_nquads(spark, str(p))
    assert _rows(back) == sorted(parse_nquads(text))


def test_read_error_modes(spark, tmp_path):
    p = tmp_path / "bad.nq"
    p.write_text(f"<{EX}s> <{EX}p> \"ok\" .\nthis is not nquads\n")
    with pytest.raises(Exception, match="N-Quads parse error"):
        read_nquads(spark, str(p)).collect()
    good = read_nquads(spark, str(p), on_error="skip")
    assert _rows(good) == [(EX + "s", EX + "p", "ok", "Literal",
                            XSD_STRING, None, "")]
    with pytest.raises(ValueError):
        read_nquads(spark, str(p), on_error="quarantine")


def test_read_dedup(spark, tmp_path):
    line = f"<{EX}s> <{EX}p> \"v\" ."
    p = tmp_path / "dup.nq"
    p.write_text(f"{line}\n{line}\n{line}\n")
    assert read_nquads(spark, str(p)).count() == 3
    assert read_nquads(spark, str(p), dedup=True).count() == 1


def test_roundtrip_property(spark, tmp_path):
    """Property: ANY quad set with arbitrary literal text (unicode,
    control chars, quotes, backslashes) survives the sink→source
    round-trip exactly. Seeded random generation in ONE Spark job
    (per-example Spark jobs would take minutes)."""
    import random

    rng = random.Random(20260817)

    def rand_text():
        n = rng.randrange(0, 40)
        # bias toward the escape set + unicode + controls
        pool = '"\\\n\r\t' + "ab éd中\x01\x7f'#<>@^"
        return "".join(rng.choice(pool) for _ in range(n))

    def quad():
        s = rng.choice([EX + "s1", EX + "s2", "_:b0"])
        kind = rng.choice(["lit", "lang", "typed", "iri", "bnode"])
        if kind == "lit":
            o = (rand_text(), "Literal", XSD_STRING, None)
        elif kind == "lang":
            o = (rand_text(), "Literal",
                 "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                 rng.choice(["en", "fr-CA", "de"]))
        elif kind == "typed":
            o = (rand_text(), "Literal",
                 "http://www.w3.org/2001/XMLSchema#integer", None)
        elif kind == "iri":
            o = (EX + "o", "NamedNode", None, None)
        else:
            o = ("_:b9", "BlankNode", None, None)
        return (s, EX + "p") + o + (rng.choice(["", EX + "g", "_:bg"]),)

    quads = list({quad() for _ in range(120)})
    path = str(tmp_path / "nq_prop")
    write_nquads(_df(spark, quads), path)
    assert _rows(read_nquads(spark, path)) == sorted(quads)
