"""Unit tests for the scalar layer: text/date/canonicalize functions
(SURVEY.md §5.2 — operator unit tests for M3-M7, M4 variants, M5 cascade)."""

from datetime import datetime

import pytest

from newsray.canonicalize import absolutize, canonicalize, is_valid_href
from newsray.datefns import (
    DEFAULT_NOW,
    day_group_label,
    parse_cascade,
    parse_one,
    within_last_days,
)
from newsray.extract import make_seq, parse_article, parse_listing
from newsray.textfns import (
    KeywordMatcher,
    fuzz_ratio,
    fuzzy_is_dup,
    html_to_text,
    levenshtein,
    normalize_for_fuzzy,
    tokenize,
)

NOW = datetime(2025, 4, 18, 17, 0, 0)


# -- M5: timestamp cascades --------------------------------------------------


@pytest.mark.parametrize(
    "raw,fmt,expected",
    [
        ("2025.04.18. 09:30:15", "ymd_dot_hms", datetime(2025, 4, 18, 9, 30, 15)),
        ("09:30", "hm_today", datetime(2025, 4, 18, 9, 30)),
        ("2025-04-18 09:30:15", "ymd_dash_hms", datetime(2025, 4, 18, 9, 30, 15)),
        ("2025-04-18 09:30", "ymd_dash_hm", datetime(2025, 4, 18, 9, 30)),
        ("2025.04.18 09:30", "ymd_dot_hm", datetime(2025, 4, 18, 9, 30)),
        ("04-18 09:30", "md_hm_yearinject", datetime(2025, 4, 18, 9, 30)),
        ("2025년 4월 18일", "korean_ymd", datetime(2025, 4, 18)),
        # ISO-Z is UTC; +9h KST shift
        ("2025-04-18T00:30:00Z", "iso_z_kst", datetime(2025, 4, 18, 9, 30)),
        ("기자 아무개 | 2025-04-18 09:30", "pipe_ymd_dash_hm", datetime(2025, 4, 18, 9, 30)),
    ],
)
def test_parse_one_formats(raw, fmt, expected):
    assert parse_one(raw, fmt, NOW) == expected


def test_parse_cascade_first_match_and_junk():
    fmts = ("ymd_dash_hm", "ymd_dot_hm", "md_hm_yearinject")
    assert parse_cascade("2025.04.17 08:00", fmts, NOW) == datetime(2025, 4, 17, 8, 0)
    assert parse_cascade("곧 업데이트", fmts, NOW) is None  # junk → record dropped
    assert parse_cascade(None, fmts, NOW) is None
    # year injection uses now.year
    assert parse_cascade("01-02 03:04", fmts, NOW) == datetime(2025, 1, 2, 3, 4)


def test_recency_window():
    assert within_last_days(datetime(2025, 4, 17, 12, 0), NOW, 2)
    assert not within_last_days(datetime(2025, 4, 16, 12, 0), NOW, 2)


def test_day_group_labels_korean_vs_english():
    ts = datetime(2025, 4, 18, 10, 0)  # a Friday
    assert day_group_label(ts, "korean") == "2025년 04월 18일 금요일"
    assert day_group_label(ts, "english") == "2025년 04월 18일 Friday"


# -- M4: canonicalization variants -------------------------------------------


def test_canonicalize_strips_query_fragment():
    c, h = canonicalize("https://news.nate.test/art/x1?mid=n0100#top", "https://news.nate.test/")
    assert c == "https://news.nate.test/art/x1" and h == "news.nate.test"


def test_canonicalize_protocol_relative_and_relative():
    c, _ = canonicalize("//news.yna.test/art/a2", "https://news.yna.test/sec/nk0")
    assert c == "https://news.yna.test/art/a2"
    c, _ = canonicalize("/art/a3", "https://news.yna.test/sec/nk0")
    assert c == "https://news.yna.test/art/a3"


def test_canonicalize_dot_relative_and_host_dot():
    c, _ = canonicalize("./art/a4", "https://news.google.test/sec/topic0")
    assert c == "https://news.google.test/art/a4"
    c, _ = canonicalize("https://news.google.test./art/a5", "https://news.google.test/")
    assert c == "https://news.google.test/art/a5"


def test_href_validity():
    assert not is_valid_href("javascript:void(0)")
    assert not is_valid_href("")
    assert not is_valid_href(None)
    assert not is_valid_href("#frag")
    assert not is_valid_href("mailto:x@y.z")
    assert is_valid_href("/art/ok")


def test_absolutize_image():
    assert (
        absolutize("/thumb/a.jpg", "https://news.voa.test/")
        == "https://news.voa.test/thumb/a.jpg"
    )


# -- M7: relevance variants ---------------------------------------------------

INC = ["kalpha", "kbeta", "kgamma"]
EXC = ["xbad"]


def test_wordset_variant_word_boundaries():
    m = KeywordMatcher(INC, EXC, "wordset", check_exclude=True)
    assert m.relevant("news kalpha and kbeta today")
    assert not m.relevant("prefixkalpha kbeta only-one-boundary")  # embedded ≠ word
    assert not m.relevant("kalpha kbeta xbad")  # exclude kills


def test_substring_variant_matches_embedded():
    m = KeywordMatcher(INC, EXC, "substring", check_exclude=True)
    assert m.relevant("prefixkalpha suffixkbeta")  # substring counts
    assert not m.relevant("kalpha only one")
    assert not m.relevant("kalpha kbeta abcxbaddef")  # exclude as substring too


def test_regex_variant_boundary_include_wordset_exclude():
    m = KeywordMatcher(INC, EXC, "regex", check_exclude=True)
    assert m.relevant("kalpha, kbeta!")
    assert not m.relevant("prefixkalpha kbeta")
    assert m.relevant("kalpha kbeta embeddedxbad")  # exclude is word-set → embedded ok
    assert not m.relevant("kalpha kbeta xbad")


def test_no_exclude_variant():
    m = KeywordMatcher(INC, EXC, "wordset", check_exclude=False)
    assert m.relevant("kalpha kbeta xbad")  # excludes ignored (voa/gukje/skydaily)


def test_min_floor_on_small_lists():
    m = KeywordMatcher(["konly"], EXC, "substring", check_exclude=True, floor_on_small=True)
    assert m.threshold == 1
    assert m.relevant("konly mention once")


# -- D3: fuzzy dedup ----------------------------------------------------------


def test_fuzz_ratio_and_levenshtein():
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert fuzz_ratio("same", "same") == 100
    assert fuzz_ratio("", "") == 100
    assert 0 <= fuzz_ratio("abcdef", "uvwxyz") <= 100
    assert fuzz_ratio("a", "b") == 0


def test_fuzzy_is_dup_order_dependent():
    t1 = "north summit talks continue"
    t2 = "north summit talks continue today"
    mem: list[str] = []
    assert not fuzzy_is_dup(t1, mem, 35)
    mem.append(normalize_for_fuzzy(t1))
    assert fuzzy_is_dup(t2, mem, 35)  # near-dup of accepted


def test_html_to_text_br_and_tags():
    assert html_to_text("line1<br>line2") == "line1\nline2"
    assert html_to_text("<p>hello <b>world</b></p>") == "hello world"


# -- extraction + sequencing --------------------------------------------------


def test_parse_listing_roundtrip():
    html = (
        '<ul><li class="item"><a class="lnk" href="/art/a1">Title One</a>'
        '<span class="tstamp">04-18 09:30</span><img class="thumb" src="/t/a1.jpg"/>'
        '<p class="lead">lead text</p></li>'
        '<li class="item"><a class="lnk" href="javascript:void(0)">ad</a></li></ul>'
    )
    items = parse_listing(html)
    assert len(items) == 2
    assert items[0].href == "/art/a1" and items[0].title == "Title One"
    assert items[0].time_raw == "04-18 09:30" and items[0].img == "/t/a1.jpg"
    assert items[0].lead == "lead text"
    assert items[1].dom_idx == 1


def test_parse_article_roundtrip():
    html = (
        '<h1 class="headline">T</h1><span class="published">2025-04-18 09:30</span>'
        '<div class="article-body"><p>S</p></div><img class="og" src="/i.jpg"/>'
    )
    d = parse_article(html)
    assert d == {"title": "T", "time_raw": "2025-04-18 09:30", "summary": "S", "img": "/i.jpg"}


def test_make_seq_total_order():
    # site → depth → seed → page → dom, strictly increasing along each axis
    assert make_seq(0, 0, 0, 1, 0) < make_seq(0, 0, 0, 1, 1)
    assert make_seq(0, 0, 0, 1, 99) < make_seq(0, 0, 0, 2, 0)
    assert make_seq(0, 0, 0, 99, 5) < make_seq(0, 0, 1, 1, 0)
    assert make_seq(0, 0, 99, 1, 0) < make_seq(0, 1, 0, 1, 0)
    assert make_seq(0, 255, 0, 1, 0) < make_seq(1, 0, 0, 1, 0)


def test_canonicalize_fast_path_equals_rfc_resolution():
    """The regex fast path must agree with full urljoin/urlparse resolution
    on every href shape the corpus (and reasonable webs) produce."""
    import random

    from urllib.parse import urljoin, urlparse, urlunparse

    def slow(href, base):
        h = href.strip()
        if h.startswith("//"):
            h = "https:" + h
        elif h.startswith("./"):
            h = h[1:]
        h = h.replace(".test./", ".test/")
        absu = urljoin(base, h)
        p = urlparse(absu)
        scheme = "https" if p.scheme in ("http", "https") else p.scheme
        path = p.path or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        host = p.netloc.lower()
        return urlunparse((scheme, host, path, "", "", "")), host

    rng = random.Random(7)
    bases = [
        "https://news.nate.test/sec/recent0",
        "https://news.google.test/sec/topic3/p2",
        "http://X.test/a/b/",
    ]
    forms = [
        "/art/{i}", "//news.yna.test/art/{i}", "./art/{i}",
        "https://news.voa.test/art/{i}?utm=1#x", "http://news.daum.test/art/{i}/",
        "art/{i}", "../up/{i}", "/a/./b/{i}", "/priv/art/{i}",
        "HTTPS://News.Test/art/{i}",
    ]
    for i in range(500):
        h = rng.choice(forms).format(i=i)
        for b in bases:
            assert canonicalize(h, b) == slow(h, b), (h, b)


def test_parse_cascade_series_equals_scalar():
    """The vectorized cascade (hot finalize path) must agree with the scalar
    reference on every format, junk input, and edge case."""
    import pandas as pd

    from newsray.datefns import DEFAULT_NOW, parse_cascade, parse_cascade_series
    from newsray.sites import SITES
    from newsray.synth import SyntheticWeb, WebParams

    web = SyntheticWeb(WebParams())
    raws = [
        None, "", "곧 업데이트", "09:30", "9:05", "24:00", "2025.04.18. 09:30:00",
        "2025-04-18 09:30:00", "2025-04-18 09:30", "2025.04.18 09:30",
        "04-18 09:30", "02-29 10:00", "13-01 10:00", "2025년 4월 18일",
        "2024년 2월 30일", "2025-04-18T00:30:00Z", "2025-4-18T00:30:00Z",
        "기자 아무개 | 2025-04-18 09:30", "a | b | 2025-04-18 09:30",
        "2025-04-18T00:30:00", "garbage", "2025.04.18. 09:30",
    ]
    # plus every site's organically generated stamps
    for site, cfg in SITES.items():
        for j in range(40):
            raws.append(web.time_raw(cfg, f"{site}0p1i{j}n{j}"))
    cascades = {cfg.time_formats for cfg in SITES.values()}
    cascades.add(tuple({f for c in cascades for f in c}))  # the union cascade
    for fmts in cascades:
        vec = parse_cascade_series(raws, fmts, DEFAULT_NOW)
        for raw, v in zip(raws, vec):
            want = parse_cascade(raw, fmts, DEFAULT_NOW)
            got = None if pd.isna(v) else v.to_pydatetime()
            assert got == want, (raw, fmts, got, want)


def test_day_group_labels_series_equals_scalar():
    import pandas as pd

    from newsray.datefns import DEFAULT_NOW, day_group_label, day_group_labels_series

    ts = pd.Series(pd.to_datetime([
        "2025-04-18 09:30:00", "2024-12-31 23:59:59", "2025-01-01 00:00:00",
        "2025-02-09 12:00:00",
    ]))
    for style in ("korean", "english"):
        got = day_group_labels_series(ts, style).tolist()
        want = [day_group_label(t.to_pydatetime(), style) for t in ts]
        assert got == want


def test_jaccard_grid_decomposition_equals_all_pairs():
    """The (cell_a, cell_b) doc-bucket grid used by ngram_jaccard_by_source
    must own every unordered pair exactly once and reproduce the brute-force
    all-pairs result on a duplicate-heavy corpus."""
    import numpy as np

    from newsray.dedup_ops import (
        _jaccard_pairs_cross_df,
        _jaccard_pairs_df,
        _shingles,
    )

    rng = np.random.default_rng(7)
    base = [
        " ".join(f"w{rng.integers(0, 30)}" for _ in range(25)) for _ in range(12)
    ]
    texts, ids = [], []
    for i in range(40):  # heavy duplication: many texts share a base
        t = base[i % len(base)]
        if i % 3 == 0:
            t = t + f" extra{i}"
        texts.append(t)
        ids.append(100 + i)
    ids = np.asarray(ids, dtype=np.int64)
    shs = [_shingles(t) for t in texts]

    brute = _jaccard_pairs_df(ids, shs, 0.35)
    want = set(zip(brute["doc_a"], brute["doc_b"], brute["jaccard"]))

    G = 4
    bucket = ids & (G - 1)
    got = set()
    for ca in range(G):
        for cb in range(ca, G):
            if ca == cb:
                sel = np.nonzero(bucket == ca)[0]
                df = _jaccard_pairs_df(ids[sel], [shs[i] for i in sel], 0.35)
            else:
                sa = np.nonzero(bucket == ca)[0]
                sb = np.nonzero(bucket == cb)[0]
                df = _jaccard_pairs_cross_df(
                    ids[sa], [shs[i] for i in sa],
                    ids[sb], [shs[i] for i in sb], 0.35,
                )
            cell = list(zip(df["doc_a"], df["doc_b"], df["jaccard"]))
            assert not (set(cell) & got), "a pair was owned by two cells"
            got.update(cell)
    assert want, "corpus should contain near-dup pairs"
    assert got == want


# -- round-3 additions: selector-engine extensions + zero-copy embeddings ----


def test_htmlsel_attr_ops_and_of_type_pseudos():
    from newsray.htmlsel import parse_html, select, select_one

    root = parse_html(
        "<div><span class='byline'><em>kim</em><em>id9</em><em>2025.04.18 09:30</em>"
        "</span><p class='perex news-perex'>lead</p>"
        "<span class='media_end_head ARTICLE_DATE_TIME' data-d='x'>t</span></div>"
    )
    assert select_one(root, "span.byline em:nth-of-type(3)").text == "2025.04.18 09:30"
    assert select_one(root, "span.byline em:first-of-type").text == "kim"
    assert select_one(root, "span.byline em:last-of-type").text == "2025.04.18 09:30"
    assert select_one(root, 'p[class*="perex"]').text == "lead"
    assert select_one(root, 'span[class*="ARTICLE_DATE_TIME"]').get("data-d") == "x"
    assert select_one(root, 'p[class^="perex"]') is not None
    assert select_one(root, 'p[class$="news-perex"]') is not None
    assert select_one(root, 'p[class*="nope"]') is None
    assert len(select(root, "span.byline em")) == 3


def test_selectorset_title_cascade_and_fallbacks():
    from urllib.parse import quote

    from newsray.extract import SelectorSet, parse_listing_selectors

    sel = SelectorSet(
        item="a.it",
        link="&",
        title="span.t",
        title_fallback_attr="data-title",
        title_unquote=True,
    )
    html = (
        f"<a class='it' href='/1'><span class='t'>제목 하나</span></a>"
        f"<a class='it' href='/2' data-title='{quote('제목 둘')}'>x</a>"
        f"<a class='it' href='/3'>no title anywhere</a>"
    )
    items = parse_listing_selectors(html, sel)
    # third item: configured cascade exhausted → SKIPPED, not a.text
    assert [(i.href, i.title) for i in items] == [("/1", "제목 하나"), ("/2", "제목 둘")]

    # item fallback + title-element fallback (the google shapes)
    sel2 = SelectorSet(item="article", item_fallback="div.N", title_fallback="h3, h4")
    html2 = (
        "<div class='N'><a href='/a'>링크 제목</a></div>"
        "<div class='N'><a href='/b'></a><h4>폴백 제목</h4></div>"
    )
    items2 = parse_listing_selectors(html2, sel2)
    assert [(i.href, i.title) for i in items2] == [("/a", "링크 제목"), ("/b", "폴백 제목")]


def test_emb_matrix_zero_copy_equals_pylist():
    import numpy as np
    import pyarrow as pa

    from newsray.ann import emb_matrix

    rng = np.random.default_rng(3)
    m = rng.standard_normal((40, 16)).astype(np.float32)
    col = pa.array([row.tolist() for row in m], pa.list_(pa.float32()))
    got = emb_matrix(col)
    want = np.asarray(col.to_pylist(), dtype=np.float64)
    assert got.dtype == np.float64 and got.shape == (40, 16)
    assert np.array_equal(got, want)  # bit-identical to the old path
    # sliced chunked column (offset ≠ 0) stays correct
    t = pa.table({"e": col}).slice(7, 9)
    got2 = emb_matrix(t["e"])
    assert np.array_equal(got2, want[7:16])


def test_substring_relevance_fast_path_exact():
    """The compiled-alternation fast path must be EXACTLY the naive
    per-keyword containment predicate, including overlap-prone keyword sets
    (a findall can hide an overlapped keyword — the boundary case falls
    back to the exact loop)."""
    import random

    from newsray.textfns import KeywordMatcher

    rng = random.Random(0)
    vocab = ["북한", "한미", "미사일", "일본", "본부", "사일로", "a", "ab", "b"]

    def naive(inc, exc, check_exclude, thr, text):
        low = text.lower()
        if sum(1 for k in inc if k.lower() in low) < thr:
            return False
        return not (check_exclude and any(k.lower() in low for k in exc))

    for _ in range(5000):
        inc = rng.sample(vocab, rng.randint(0, 5))
        exc = rng.sample(vocab, rng.randint(0, 3))
        chk = rng.random() < 0.7
        m = KeywordMatcher(inc, exc, variant="substring", check_exclude=chk)
        text = "".join(rng.choice(vocab + [" ", " "]) for _ in range(rng.randint(0, 12)))
        assert m.relevant(text) == naive(inc, exc, chk, m.threshold, text), (
            inc, exc, chk, text)


def test_ann_query_load_is_predicate_pushdown(tmp_path):
    """VERDICT r3 #1: the ANN query loads must read O(queries) rows, never
    the full embeddings table onto the driver. `_load_query_rows` pushes the
    vec_id predicate into the parquet scan — on a 10k-row file it returns
    exactly the query rows, and `_load_query` reproduces the old vector
    bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from newsray.ann import _load_query, _load_query_rows

    rng = np.random.default_rng(7)
    n, dim = 10_000, 8
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet", row_group_size=512)

    rows = _load_query_rows(str(tmp_path), 5)
    assert rows.num_rows == 5  # row-level filter applied, not just row groups
    assert sorted(rows["vec_id"].to_pylist()) == [0, 1, 2, 3, 4]

    q = _load_query(str(tmp_path))
    want = vecs[0].astype(np.float64)
    want /= np.linalg.norm(want)
    assert np.array_equal(q, want)
