"""robots.txt parsing + matching (operators/web.py) — RFC 9309 edges."""

from pg_logical_replication_spark.operators.web import (
    parse_robots_rules,
    robots_match,
)


def test_rfc_tiebreak_and_group_attribution(spark):
    """Equal-length Allow/Disallow → Allow wins; rules under another
    user-agent group are invisible to '*'; empty Disallow adds no rule;
    a URL whose site has rules but no match stays allowed."""
    robots = spark.createDataFrame(
        [
            (
                1,
                "User-agent: *\n"
                "Disallow: /a/\n"
                "Allow: /a/x\n"          # same length as the next line
                "Disallow: /a/x\n"       # tie -> Allow must win
                "Disallow:\n"            # empty value: allow-all, no rule
                "User-agent: evil\n"
                "Disallow: /\n",
            ),
            (2, "User-agent: *\nDisallow: /only/\n"),
        ],
        "site long, robots_txt string",
    )
    rules = parse_robots_rules(robots)
    got = {(r["site"], r["verb"], r["path"]) for r in rules.collect()}
    assert got == {
        (1, "disallow", "/a/"),
        (1, "allow", "/a/x"),
        (1, "disallow", "/a/x"),
        (2, "disallow", "/only/"),
    }  # evil group and empty Disallow excluded

    urls = spark.createDataFrame(
        [
            (1, "/a/x123"),   # tie at len 4 -> Allow wins
            (1, "/a/other"),  # only /a/ matches -> denied
            (1, "/free"),     # no rule -> allowed
            (2, "/only/f"),   # denied
            (2, "/else"),     # rules exist but none match -> allowed
        ],
        "site long, url_path string",
    )
    verdict = {
        r["url_path"]: (r["allowed"], r["matched_rule"])
        for r in robots_match(urls, rules).collect()
    }
    assert verdict == {
        "/a/x123": (True, "/a/x"),
        "/a/other": (False, "/a/"),
        "/free": (True, ""),
        "/only/f": (False, "/only/"),
        "/else": (True, ""),
    }


def test_canonical_url_rules(spark):
    """Each canonicalization rule in isolation and combination: case,
    fragment, www., tracking-param removal, param sort, trailing
    slash, all-params-dropped, no-query passthrough."""
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.web import canonical_url

    cases = [
        ("https://Site.Example.com/P1", "https://site.example.com/p1"),
        ("https://www.site.com/a#frag", "https://site.com/a"),
        ("https://site.com/a/?b=2&a=1", "https://site.com/a?a=1&b=2"),
        ("https://site.com/a?utm_source=x&b=1", "https://site.com/a?b=1"),
        # every param is tracking -> bare base, no dangling '?'
        ("https://site.com/a?utm_a=1&gclid=2&fbclid=3", "https://site.com/a"),
        ("https://site.com/a", "https://site.com/a"),
        # fragment after params, params shuffled, www + case
        ("HTTPS://WWW.S.COM/P?B=2&UTM_C=9&A=1#X", "https://s.com/p?a=1&b=2"),
        # dirty second '?': everything after the FIRST '?' is query —
        # split-based indexing silently dropped the tail (round-7 fix)
        ("https://s.com/p?b=2?x&a=1", "https://s.com/p?a=1&b=2?x"),
        # '&&' produces an empty param: filtered, no dangling '&'
        ("https://s.com/p?a=1&&b=2", "https://s.com/p?a=1&b=2"),
        # www. strip is ANCHORED: a www. URL embedded in the QUERY must
        # survive, or two genuinely different pages false-merge (and
        # DuckDB's first-match regexp_replace would disagree with
        # Spark's global one) — round-7 review
        ("https://a.com/r?to=https://www.b.com",
         "https://a.com/r?to=https://www.b.com"),
        ("https://www.a.com/r?to=https://www.b.com",
         "https://a.com/r?to=https://www.b.com"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_groups(spark):
    from pg_logical_replication_spark.operators.web import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://www.a.com/x?utm_s=1"),
            (2, "https://a.com/x/"),
            (3, "HTTPS://A.COM/X#top"),
            (4, "https://b.com/y?k=1"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canonical_url"]: (r["n_docs"], r["keep_id"])
            for r in url_dedup(df).collect()}
    assert rows == {
        "https://a.com/x": (3, 1),
        "https://b.com/y?k=1": (1, 4),
    }
