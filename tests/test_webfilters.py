"""Web-text admission filters (functions/webfilters): Gopher document
rules, C4 line filtering, cross-doc paragraph dedup, hashed-linear
scoring — unit semantics on hand-built pages plus the plan shapes the
docstrings promise (the first three map stages must be shuffle-free;
paragraph_dedup's winner election must stay a HashAggregate).
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from atra_spark.functions.webfilters import (
    c4_line_filter,
    gopher_quality,
    hashed_linear_score,
    paragraph_dedup,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


GOOD = (
    "the data should be good and that it must have been fine with "
    "everyone here today because the table was sorted " * 3
).strip()  # 63 words, all alpha, stopword-rich


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherQuality:
    def test_clean_doc_keeps(self, spark):
        out = gopher_quality(_rows(spark, [(1, GOOD)])).collect()[0]
        assert out.keep is True
        assert out.n_words == 63
        assert out.n_stop_hits >= 2

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda t: "word " * 10,  # too few words
            lambda t: ("a " * 60),  # mean word len < 3
            lambda t: t + " " + "# " * 20,  # symbol ratio > 0.1
            lambda t: t.replace(" ", "\n- ", 40),  # bullet lines
            lambda t: t.replace(" ", "...\n", 40),  # ellipsis lines
            lambda t: t + " " + "123 " * 60,  # alpha frac < 0.8
        ],
    )
    def test_each_rule_drops(self, spark, mutate):
        out = gopher_quality(_rows(spark, [(1, mutate(GOOD))])).collect()[0]
        assert out.keep is False

    def test_no_stopwords_drops(self, spark):
        text = "alpha beta gamma delta " * 20  # 80 words, zero stopwords
        out = gopher_quality(_rows(spark, [(1, text)])).collect()[0]
        assert out.n_stop_hits == 0 and out.keep is False

    def test_empty_doc_is_total(self, spark):
        out = gopher_quality(_rows(spark, [(1, "")])).collect()[0]
        assert out.keep is False and out.n_words == 0
        assert out.mean_word_len == 0.0

    def test_shuffle_free(self, spark):
        plan = _plan(gopher_quality(_rows(spark, [(1, GOOD)])))
        assert "Exchange" not in plan, "gopher rules must be a pure map stage"


class TestC4LineFilter:
    PAGE = (
        "Home | About\n"
        "This sentence has more than five words in it.\n"
        "short line.\n"  # < 5 words
        "Please enable javascript to continue reading here.\n"  # javascript
        "A second good sentence with many words inside!\n"
        'A third "quoted" sentence of seven words here."\n'
        "var x = { a: 1 };\n"  # brace
    )

    def test_line_rules(self, spark):
        out = c4_line_filter(_rows(spark, [(1, self.PAGE)])).collect()[0]
        kept = out.clean_text.split("\n")
        assert out.n_lines == 7 and out.n_kept == 3
        assert kept[0].startswith("This sentence")
        assert kept[1].startswith("A second")
        assert kept[2].startswith("A third")
        assert out.doc_keep is True

    def test_lorem_blocks_page(self, spark):
        out = c4_line_filter(
            _rows(spark, [(1, self.PAGE + "\nwe have Lorem Ipsum filler text.")])
        ).collect()[0]
        assert out.n_kept == 4 and out.doc_keep is False

    def test_min_kept_lines(self, spark):
        one_line = "Only one complete sentence with enough words here.\n??"
        out = c4_line_filter(_rows(spark, [(1, one_line)])).collect()[0]
        assert out.n_kept == 1 and out.doc_keep is False
        assert out.clean_text == "Only one complete sentence with enough words here."

    def test_shuffle_free(self, spark):
        plan = _plan(c4_line_filter(_rows(spark, [(1, self.PAGE)])))
        assert "Exchange" not in plan, "c4 line filter must be a pure map stage"


class TestParagraphDedup:
    def test_keep_first_across_docs(self, spark):
        rows = [
            (1, "unique one\nshared footer\nunique two"),
            (2, "shared footer\nunique three"),
            (3, "unique four\n\n  shared footer  "),
        ]
        out = {r.doc_id: r for r in paragraph_dedup(_rows(spark, rows)).collect()}
        assert out[1].n_kept == 3  # first occurrence of the footer wins
        assert out[2].n_kept == 1 and out[2].dedup_text == "unique three"
        assert out[3].n_kept == 1 and out[3].dedup_text == "unique four"
        assert out[3].n_lines == 2  # blank line not counted

    def test_order_restored(self, spark):
        rows = [(1, "a b c line\nz z z line\nm m m line")]
        out = paragraph_dedup(_rows(spark, rows)).collect()[0]
        assert out.dedup_text == "a b c line\nz z z line\nm m m line"

    def test_winner_stays_hash_aggregate(self, spark):
        df = _rows(spark, [(i, "p one\np two\np three") for i in range(8)])
        plan = _plan(paragraph_dedup(df))
        assert "SortAggregate" not in plan
        assert "HashAggregate" in plan


class TestHashedLinearScore:
    def test_deterministic_and_bounded(self, spark):
        df = _rows(spark, [(1, GOOD), (2, "zebra quark " * 30), (3, "")])
        a = {r.doc_id: r for r in hashed_linear_score(df).collect()}
        b = {r.doc_id: r for r in hashed_linear_score(df).collect()}
        for i in (1, 2, 3):
            assert a[i].score == b[i].score
            assert -1.0 <= a[i].score <= 1.0
        assert a[3].n_words == 0 and a[3].score == 0.0 and a[3].keep is False

    def test_map_only(self, spark):
        plan = _plan(hashed_linear_score(_rows(spark, [(1, GOOD)])))
        assert "Exchange" not in plan, "hashed scorer must not shuffle"


class TestExactSubstringDedup:
    """dedup.exact_substring_dedup — Lee et al. 2022 ExactSubstr
    semantics at token granularity, keep-first."""

    def test_keep_first_and_span_composition(self, spark):
        from atra_spark.functions.dedup import exact_substring_dedup

        dup = "one two three four five six seven eight"  # exactly 8 tokens
        rows = [
            (1, f"alpha {dup} beta"),
            (2, f"{dup} gamma delta"),  # later doc: span removed
        ]
        out = {
            r.doc_id: r
            for r in exact_substring_dedup(
                _rows(spark, rows), window=8
            ).collect()
        }
        assert out[1].n_removed == 0 and "one two" in out[1].dedup_text
        assert out[2].n_removed == 8
        assert out[2].dedup_text == "gamma delta"

    def test_overlapping_windows_excise_maximal_region(self, spark):
        from atra_spark.functions.dedup import exact_substring_dedup

        # a 10-token duplicated region = three overlapping 8-windows;
        # the union must remove all 10 tokens in the later doc
        region = "a b c d e f g h i j"
        rows = [(1, f"{region} tail1"), (2, f"head2 {region}")]
        out = {
            r.doc_id: r
            for r in exact_substring_dedup(
                _rows(spark, rows), window=8
            ).collect()
        }
        assert out[1].n_removed == 0
        assert out[2].n_removed == 10 and out[2].dedup_text == "head2"

    def test_short_and_empty_docs_pass_through(self, spark):
        from atra_spark.functions.dedup import exact_substring_dedup

        rows = [(1, "just a few words"), (2, ""), (3, "just a few words")]
        out = {
            r.doc_id: r
            for r in exact_substring_dedup(
                _rows(spark, rows), window=8
            ).collect()
        }
        # shorter than the window: no grams, nothing removed, even
        # though docs 1 and 3 are identical
        assert out[1].n_removed == 0 and out[3].n_removed == 0
        assert out[3].dedup_text == "just a few words"
        assert out[2].n_tokens == 0 and out[2].dedup_text == ""

    def test_election_stays_hash_aggregate(self, spark):
        from atra_spark.functions.dedup import exact_substring_dedup

        df = _rows(spark, [(i, "w x y z " * 4) for i in range(4)])
        plan = _plan(exact_substring_dedup(df, window=8))
        assert "SortAggregate" not in plan
        assert "HashAggregate" in plan
