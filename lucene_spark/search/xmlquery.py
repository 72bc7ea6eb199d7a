"""XML query syntax (queryparser/xml/CoreParser.java): build query
trees from the reference's element vocabulary.

Supported elements (builders in queryparser/xml/builders/):

- ``TermQuery`` (TermQueryBuilder: fieldName inherited from ancestors,
  boost attr; text content is used VERBATIM like the reference);
- ``TermsQuery`` (TermsQueryBuilder: content ANALYZED with the field's
  chain into SHOULD TermQuerys, minimumNumberShouldMatch);
- ``BooleanQuery`` (BooleanQueryBuilder: ``<Clause occurs="should|
  must|mustNot|filter">`` children, minimumNumberShouldMatch, boost;
  unknown occurs raises like getOccursValue);
- ``DisjunctionMaxQuery`` (tieBreaker attr, arbitrary sub-queries);
- ``MatchAllDocsQuery``; ``ConstantScoreQuery`` (first child, boost);
- ``UserQuery`` (UserInputQueryBuilder: classic parser passthrough);
- ``RangeQuery`` (term range, includeLower/includeUpper — mapped to
  the term-dictionary range scan; the reference maps it to
  TermRangeQuery);
- ``PointRangeQuery`` (numeric lowerTerm/upperTerm on a doc-values
  column): the engine pushes numeric ranges down as metadata
  predicates, so this element is accepted at the TOP level or as a
  direct ``filter``/``must`` clause of the top boolean and folded into
  the search's doc_filter (documented deviation — the reference scores
  it as a constant-score iterator anywhere in the tree);
- ``FuzzyLikeThisQuery`` (``<Field fieldName=..>text</Field>`` children
  + maxNumTerms/prefixLength/ignoreTF — requires a searcher because the
  rewrite reads the term dictionary, like the reference's rewrite()).

``parse_xml_query`` returns ``XmlParsed(query, doc_filter)``; run with
``searcher.search_df(parsed.query, doc_filter=parsed.doc_filter)``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, replace

from .query import (BooleanQuery, ConstantScoreQuery, DisMaxQuery,
                    MatchAllQuery, MultiTermQuery, PreAnalyzed,
                    TermQuery, parse_query)

__all__ = ["parse_xml_query", "XmlParsed", "XmlParserError"]


class XmlParserError(ValueError):
    pass


@dataclass(frozen=True)
class XmlParsed:
    query: object
    doc_filter: str | None = None


def _field(e, inherited):
    return e.get("fieldName", inherited)


def _boost(e, q):
    b = float(e.get("boost", 1.0))
    if b == 1.0:
        return q
    if hasattr(q, "boost"):
        return replace(q, boost=q.boost * b)
    return BooleanQuery(must=(q,), field=getattr(q, "field", "text"),
                        boost=b)


def _analyze(searcher, field, text):
    from ..kernels.tokenizer import analyze_one
    chain = searcher._field_chain(field) if searcher is not None \
        else "standard"
    return analyze_one(text or "", chain)


def _point_range_filter(e, inherited) -> str:
    f = _field(e, inherited)
    if f is None:
        raise XmlParserError("PointRangeQuery needs fieldName")
    lo, hi = e.get("lowerTerm"), e.get("upperTerm")
    parts = []
    if lo is not None:
        parts.append(f"{f} >= {float(lo):g}")
    if hi is not None:
        parts.append(f"{f} <= {float(hi):g}")
    if not parts:
        raise XmlParserError("PointRangeQuery needs lowerTerm/upperTerm")
    return " and ".join(parts)


def _build(e, field, searcher):
    tag = e.tag
    if tag == "TermQuery":
        # TermQueryBuilder uses the element text VERBATIM (no
        # analysis); PreAnalyzed stops the searcher re-stemming it
        f = _field(e, field)
        return PreAnalyzed(_boost(e, TermQuery((e.text or "").strip(),
                                               f)))
    if tag == "TermsQuery":
        f = _field(e, field)
        toks = _analyze(searcher, f, (e.text or "").strip())
        mnm = int(e.get("minimumNumberShouldMatch", 0))
        # analyzed ONCE here (TermsQueryBuilder analyzes at parse);
        # PreAnalyzed prevents a second pass at query time
        return PreAnalyzed(_boost(e, BooleanQuery(
            should=tuple(toks), field=f, min_should_match=mnm)))
    if tag == "MatchAllDocsQuery":
        return MatchAllQuery()
    if tag == "BooleanQuery":
        occ = {"should": [], "must": [], "mustNot": [], "filter": []}
        for c in e:
            if c.tag != "Clause":
                continue
            occurs = c.get("occurs", "should")
            key = {"should": "should", "must": "must",
                   "mustnot": "mustNot", "filter": "filter"}.get(
                       occurs.lower())
            if key is None:
                raise XmlParserError(
                    f'Invalid value for "occurs" attribute: {occurs}')
            kids = list(c)
            if not kids:
                raise XmlParserError("Clause with no sub-query")
            occ[key].append(_build(kids[0], _field(e, field), searcher))
        return _boost(e, BooleanQuery(
            must=tuple(occ["must"]), should=tuple(occ["should"]),
            must_not=tuple(occ["mustNot"]), filter_=tuple(occ["filter"]),
            field=_field(e, field),
            min_should_match=int(e.get("minimumNumberShouldMatch", 0))))
    if tag == "DisjunctionMaxQuery":
        kids = tuple(_build(c, _field(e, field), searcher) for c in e)
        return _boost(e, DisMaxQuery(
            kids, field=_field(e, field),
            tie_breaker=float(e.get("tieBreaker", 0.0))))
    if tag == "ConstantScoreQuery":
        kids = list(e)
        if not kids:
            raise XmlParserError("ConstantScoreQuery with no child")
        return ConstantScoreQuery(
            _build(kids[0], _field(e, field), searcher),
            _field(e, field) or "text",
            boost=float(e.get("boost", 1.0)))
    if tag == "UserQuery":
        return _boost(e, parse_query((e.text or "").strip(),
                                     field=field or "text"))
    if tag == "RangeQuery":
        f = _field(e, field)
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        inc_lo = e.get("includeLower", "true").lower() == "true"
        inc_hi = e.get("includeUpper", "true").lower() == "true"
        # engine range is [lower, upper): TermRangeQuery's inclusive
        # flags map via the lowest-suffix trick the classic parser uses
        if lo is not None and not inc_lo:
            lo = lo + "\x00"
        if hi is not None and inc_hi:
            hi = hi + "\x00"
        return _boost(e, MultiTermQuery("range", (lo, hi), f,
                                        rewrite="constant_score"))
    if tag == "FuzzyLikeThisQuery":
        if searcher is None:
            raise XmlParserError("FuzzyLikeThisQuery needs a searcher")
        fields = [(c.get("fieldName", field), (c.text or "").strip())
                  for c in e if c.tag == "Field"]
        if len(fields) != 1:
            raise XmlParserError(
                "exactly one Field element supported per "
                "FuzzyLikeThisQuery")
        f, text = fields[0]
        q = searcher.fuzzy_like_this(
            text, field=f,
            max_num_terms=int(e.get("maxNumTerms", 50)),
            prefix_length=int(e.get("prefixLength", 0)),
            ignore_tf=e.get("ignoreTF", "false").lower() == "true")
        b = float(e.get("boost", 1.0))
        if b != 1.0:
            # boost the tree INSIDE the PreAnalyzed marker (the marker
            # itself carries no boost)
            if isinstance(q, PreAnalyzed):
                q = PreAnalyzed(replace(q.query,
                                        boost=q.query.boost * b))
            else:
                q = _boost(e, q)
        return q
    raise XmlParserError(f"unsupported element: {tag}")


def parse_xml_query(xml: str, field: str = "text",
                    searcher=None) -> XmlParsed:
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as ex:
        raise XmlParserError(f"malformed XML: {ex}") from ex
    # fold top-level / top-boolean PointRangeQuery into doc_filter
    filters = []
    if root.tag == "PointRangeQuery":
        return XmlParsed(MatchAllQuery(),
                         _point_range_filter(root, field))
    if root.tag == "BooleanQuery":
        for c in list(root):
            if c.tag != "Clause":
                continue
            kids = list(c)
            if kids and kids[0].tag == "PointRangeQuery":
                if c.get("occurs", "should").lower() not in (
                        "filter", "must"):
                    raise XmlParserError(
                        "PointRangeQuery supported only as a "
                        "filter/must clause")
                filters.append(
                    _point_range_filter(kids[0], _field(root, field)))
                root.remove(c)
    if (root.tag == "BooleanQuery" and filters
            and not any(c.tag == "Clause" for c in root)):
        # every clause was a folded PointRangeQuery: the query is the
        # range itself (reference: a filter-only boolean still matches)
        return XmlParsed(MatchAllQuery(), " and ".join(filters))
    q = _build(root, field, searcher)
    if filters and isinstance(q, BooleanQuery) and not q.must \
            and not q.filter_:
        # the folded range was the boolean's only required clause; in
        # the reference its presence keeps SHOULD clauses optional
        # (and lets a must_not-only remainder match). Re-anchor with a
        # zero-score MatchAll must so the engine's msm rule sees a
        # required clause — matching set unchanged (the doc_filter is
        # the range), scores = the matching optional clauses
        import dataclasses as _dc
        q = _dc.replace(q, must=(MatchAllQuery(field=q.field,
                                               boost=0.0),))
    return XmlParsed(q, " and ".join(filters) or None)
