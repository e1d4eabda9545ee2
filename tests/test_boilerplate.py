"""M4 main-content extraction: gate-by-gate unit cases on handcrafted
HTML plus the generator-vs-expected property over real document text.

The expected side is computed by construction (known content divs →
shared strip_html leaf), never by the pruning code — see
functions/boilerplate.py docstring and the reference semantics it
re-expresses (crawler/utils/utils.py:283-456)."""

import pyarrow.parquet as pq
import pytest

from crawlerframework_ray.functions.boilerplate import (
    content_paragraphs,
    expected_extract,
    remove_boilerplate,
    strip_html,
    synth_doc_html,
)

GOOD_PARA = "the quick brown fox jumps over the lazy dog near the riverbank every single morning"


def _wrap(body: str) -> str:
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def test_content_paragraph_kept():
    out = remove_boilerplate(_wrap(f"<div><p>{GOOD_PARA}</p></div>"))
    assert GOOD_PARA in out


def test_link_farm_removed():
    nav = "".join(f'<a href="/{i}">link {i}</a> | ' for i in range(8))
    out = remove_boilerplate(_wrap(f"<div>{nav}</div><div><p>{GOOD_PARA}</p></div>"))
    assert "link 3" not in out
    assert GOOD_PARA in out


def test_short_snippet_list_removed():
    cloud = "".join(f"<li>tag{i}</li>" for i in range(6))
    out = remove_boilerplate(_wrap(f"<ul>{cloud}</ul><div><p>{GOOD_PARA}</p></div>"))
    assert "tag1" not in out
    assert GOOD_PARA in out


def test_empty_div_removed_and_junk_tags_stripped():
    out = remove_boilerplate(
        _wrap(f"<div></div><script>var x=1;</script><div><p>{GOOD_PARA}</p></div>")
    )
    assert "var x" not in out
    assert GOOD_PARA in out


def test_innermost_first_nested_junk_inside_content():
    """The inner link farm dies first; the outer div is then judged on
    its remaining (clean) text and survives — the reason the reference
    prunes innermost-out."""
    nav = "".join(f'<a href="/{i}">more {i}</a>' for i in range(10))
    html = _wrap(f"<div><div>{nav}</div><p>{GOOD_PARA}</p></div>")
    out = remove_boilerplate(html)
    assert "more 4" not in out
    assert GOOD_PARA in out


def test_head_and_comments_dropped():
    out = remove_boilerplate(
        "<!-- comment --><junk/>"
        + _wrap(f"<!-- inner --><div><p>{GOOD_PARA}</p></div>")
    )
    assert "comment" not in out
    assert GOOD_PARA in out


def test_strip_html_shapes():
    # each p/br boundary is its own newline; a RUN of blank lines
    # collapses to one blank line (the reference's ^(\s*\n)+ → \n)
    assert strip_html("<p>a</p><br/>b") == "a\n\nb"
    assert strip_html("<p>a</p>\n\n<br/>\n<br/>b") == "a\n\nb"
    assert strip_html("<span>a</span>&nbsp;b") == "a  b"


def test_short_doc_yields_no_content():
    assert expected_extract("tiny doc") == strip_html("<html><body></body></html>")
    out = remove_boilerplate(synth_doc_html(7, "tiny doc"))
    assert "tiny" not in out


@pytest.mark.parametrize("doc_id,nwords", [(0, 30), (3, 57), (11, 95)])
def test_generator_matches_expected(doc_id, nwords):
    text = " ".join(f"w{i}word" for i in range(nwords))
    assert remove_boilerplate(synth_doc_html(doc_id, text)) == expected_extract(text)
    # folding: no paragraph shorter than 8 words unless the doc is
    assert all(len(p.split()) >= 8 for p in content_paragraphs(text))


def test_real_documents_extraction_matches_expected():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()[:50]
    texts = t.column("text").to_pylist()[:50]
    for i, x in zip(ids, texts):
        assert remove_boilerplate(synth_doc_html(int(i), x)) == expected_extract(x)
