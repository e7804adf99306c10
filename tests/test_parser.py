from bids_spark.plans.parser import Bool, Phrase, Term, parse_query


def test_single_term():
    b = parse_query("strcpy")
    assert b.should == [Term("strcpy")] and not b.must and not b.must_not


def test_default_or():
    b = parse_query("malloc free")
    assert b.should == [Term("malloc"), Term("free")]


def test_and():
    b = parse_query("libc AND libpng")
    inner = b.should[0] if b.should else b
    assert isinstance(inner, Bool)
    assert inner.must == [Term("libc"), Term("libpng")]


def test_must_not():
    b = parse_query("libc -strcpy")
    assert b.should == [Term("libc")]
    assert b.must_not == [Term("strcpy")]


def test_plus_must():
    b = parse_query("+libc strcpy")
    assert b.must == [Term("libc")]
    assert b.should == [Term("strcpy")]


def test_phrase():
    b = parse_query('"merge join now"')
    assert b.should == [Phrase(("merge", "join", "now"))]


def test_phrase_single_token_degrades():
    b = parse_query('"strcpy"')
    assert b.should == [Term("strcpy")]


def test_case_normalized():
    b = parse_query("StrCpy")
    assert b.should == [Term("strcpy")]


def test_parens_nesting():
    b = parse_query("data AND (merge OR join)")
    inner = b.should[0] if b.should else b
    assert isinstance(inner, Bool)
    assert Term("data") in inner.must
    nested = [m for m in inner.must if isinstance(m, Bool)]
    assert nested and nested[0].should == [Term("merge"), Term("join")]


def test_empty_query():
    b = parse_query("")
    assert not b.must and not b.should and not b.must_not


def test_punctuation_only_query():
    b = parse_query("!!! ???")
    assert not b.must and not b.should and not b.must_not


# -- field-scoped queries (content is the schema's only text field) ----------


def test_field_scoped_term_is_identity():
    assert parse_query("content:merge") == parse_query("merge")
    assert parse_query("content:merge join") == parse_query("merge join")
    assert parse_query("data AND content:merge") == parse_query("data AND merge")


def test_field_scoped_phrase():
    assert parse_query('content:"merge join"') == parse_query('"merge join"')


def test_unknown_field_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown field 'title'"):
        parse_query("title:merge")
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("data OR body:stuff")


def test_colon_words_that_are_not_fields_stay_terms():
    """Times/URLs keep working as plain text; only identifier-shaped
    prefixes are field syntax (tantivy errors on unknown FIELDS, but
    '12' / 'http' are not field-shaped)."""
    from bids_spark.plans.parser import Phrase, Term, parse_query

    q = parse_query("deploy at 12:30")
    terms = {c.term for c in q.should if isinstance(c, Term)}
    assert {"deploy", "at"} <= terms
    assert any(
        isinstance(c, Phrase) and c.terms == ("12", "30") for c in q.should
    ) or {"12", "30"} <= terms
    # identifier-shaped unknown field still errors (reference parity)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_query("title:x")


def test_identifier_colon_is_always_field_syntax():
    """An identifier-shaped prefix before ':' ALWAYS means field
    scoping — so bare URLs raise like any undeclared field (tantivy's
    QueryParser parity); quoting them searches the tokens instead."""
    import pytest

    with pytest.raises(ValueError, match="unknown field 'http'"):
        parse_query("http://example.com")
    q = parse_query('"http://example.com"')
    assert q.should == [Phrase(("http", "example", "com"))]
