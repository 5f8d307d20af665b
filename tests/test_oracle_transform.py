"""Unit tests for the oracle-SQL portable-cast rewriter and the small
ADVICE-r9 hardening fixes around it (registry.portable_double_casts,
topics.compact on a dropped topic, HLL small-m alpha constants)."""

from __future__ import annotations

from polar_spark.queries.registry import portable_double_casts


def test_cast_rewrite_basic_double():
    out = portable_double_casts("SELECT CAST(x AS DOUBLE) FROM t")
    assert "typeof(x)" in out and "CAST(CAST(x AS VARCHAR) AS DOUBLE)" in out


def test_try_cast_identifier_untouched():
    """An identifier ENDING in CAST( (TRY_CAST, my_cast) must pass
    through verbatim — the old raw-substring match would have rewritten
    TRY_CAST(x AS DOUBLE) into invalid SQL."""
    sql = "SELECT TRY_CAST(x AS DOUBLE), my_cast(y AS DOUBLE) FROM t"
    assert portable_double_casts(sql) == sql


def test_lowercase_and_spaced_cast_rewritten():
    """`cast(` and `CAST (` spellings are the SAME SQL function and must
    take the portable path, not silently skip it."""
    for sql in (
        "SELECT cast(x AS DOUBLE) FROM t",
        "SELECT CAST (x AS DOUBLE) FROM t",
        "SELECT Cast(x AS DOUBLE) FROM t",
    ):
        out = portable_double_casts(sql)
        assert "typeof(x)" in out, sql


def test_comment_with_apostrophe_does_not_desync():
    """An apostrophe inside a `--` comment must not put the quote
    scanner into string mode and swallow the rest of the oracle."""
    sql = (
        "SELECT CAST(x AS DOUBLE) -- don't touch the scanner\n"
        ", CAST(y AS DOUBLE) FROM t"
    )
    out = portable_double_casts(sql)
    assert "typeof(x)" in out and "typeof(y)" in out
    assert "-- don't touch the scanner" in out


def test_string_literal_cast_text_untouched():
    sql = "SELECT 'CAST(x AS DOUBLE)' AS s, CAST(y AS DOUBLE) FROM t"
    out = portable_double_casts(sql)
    assert out.startswith("SELECT 'CAST(x AS DOUBLE)' AS s")
    assert "typeof(y)" in out


def test_non_double_cast_untouched():
    sql = "SELECT CAST(x AS BIGINT) FROM t"
    assert portable_double_casts(sql) == sql


def test_rewritten_sql_runs_in_duckdb():
    import duckdb

    out = portable_double_casts(
        "SELECT cast(x AS DOUBLE) AS d, TRY_CAST(s AS DOUBLE) AS t2 "
        "-- it's a comment\n"
        "FROM (SELECT 1::DECIMAL(10,2) AS x, 'nope' AS s)"
    )
    d, t2 = duckdb.sql(out).fetchone()
    assert d == 1.0 and t2 is None


def test_topics_compact_missing_topic_noop(spark, tmp_path):
    """compact() on a never-created (or dropped) topic returns (0, 0)
    instead of raising FileNotFoundError from the lock-file open — the
    retention sweeper iterates configured topics that may have been
    dropped (ADVICE r9)."""
    from polar_spark.topics import TopicCatalog

    cat = TopicCatalog(spark, str(tmp_path / "cat"))
    assert cat.compact("never_created") == (0, 0)


def test_hll_small_m_paper_alphas():
    """m=16 and m=32 use the HLL paper's pinned constants (0.673 /
    0.697), not the asymptotic formula (0.6757 / 0.6978)."""
    from polar_spark.functions.sketches import _hll_params

    _, num16, den16, _ = _hll_params(16)
    assert (num16, den16) == (673, 1000)
    _, num32, den32, _ = _hll_params(32)
    assert (num32, den32) == (697, 1000)
    # asymptotic sizes unchanged
    _, num128, den128, _ = _hll_params(128)
    assert (num128, den128) == (7213 * 128, 10 * (1000 * 128 + 1079))
