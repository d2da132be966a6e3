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
