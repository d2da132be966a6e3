"""Web-crawl governance operators: robots.txt (RFC 9309) parsing and
URL rule matching — the ingestion-side gate every crawl pipeline runs
before a fetch ever happens.

All JVM-side expressions (split / regexp / windows): the robots corpus
is one file per site (tiny next to the URL frontier), the frontier
joins it on the site key, and longest-match resolution is one window
per URL. DuckDB twins replay every step for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_TRACKING_PARAM_RE = "^(utm_[a-z0-9]*|fbclid|gclid)="


def canonical_url(col) -> "F.Column":
    """Canonical form of a URL — the key of the URL-level dedup stage
    every web corpus pipeline runs BEFORE content dedup (RefinedWeb
    §3.2 "URL deduplication", CCNet's per-snapshot URL pass; the
    reference has no crawl layer, so this is engine-side surface).

    Rules (deterministic, engine-portable — the DuckDB twin in
    ``q_web_url_dedup`` replays them verbatim):

    1. lowercase the whole URL;
    2. drop the fragment (``#…``);
    3. drop a ``www.`` host prefix;
    4. drop tracking params (``utm_*``, ``fbclid``, ``gclid``) and
       SORT the survivors — param order never distinguishes pages;
    5. drop a trailing slash on the pre-query part.

    Pure JVM expressions (regexp/split/filter/array_sort): the frontier
    is canonicalized in the scan, no shuffle until the dedup groupBy on
    the canonical key."""
    u = F.lower(col)
    u = F.regexp_replace(u, "#.*$", "")
    # ANCHORED www. strip, as two literal-prefix replaces: Spark's
    # regexp_replace is global while DuckDB's default is first-match,
    # so an unanchored '://www.' diverged between engines AND
    # false-merged URLs whose QUERY embeds another www. URL
    # (round-7 review)
    u = F.regexp_replace(u, "^http://www\\.", "http://")
    u = F.regexp_replace(u, "^https://www\\.", "https://")
    # first-'?' semantics via regexp, NOT split: a stray second '?'
    # (dirty crawl data) belongs to the query string, and split-based
    # indexing would silently drop everything after it
    base = F.regexp_replace(
        F.regexp_replace(u, "\\?.*$", ""), "/$", ""
    )
    q = F.regexp_extract(u, "\\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda kv: (kv != "") & ~kv.rlike(_TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed dedup: group by :func:`canonical_url`, keep the lowest
    id as the representative. Returns (canonical_url, n_docs,
    keep_id). One hash shuffle on the canonical key — at 100 TB this
    runs BEFORE fetch/decode, so the shuffled rows are frontier
    entries (url + id), not documents."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("_id").alias("keep_id"),
        )
    )


def parse_robots_rules(
    robots: DataFrame,
    site_col: str = "site",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """robots.txt text → (site, verb, path) rule rows for one
    user-agent, per RFC 9309 group semantics: a rule line belongs to
    the most recent ``User-agent:`` line(s) above it; we keep the
    ``*`` group (or an explicit agent). Lines are matched
    case-insensitively on the field name, values taken verbatim.

    One narrow pass: split lines → posexplode → a last-non-null window
    per site attributes each rule to its group — no Python, no joins.
    """
    from pyspark.sql import Window

    lines = robots.select(
        F.col(site_col).alias("site"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    ag = F.when(
        F.col("line").rlike(r"(?i)^user-agent:"),
        F.trim(F.regexp_replace(F.col("line"), r"(?i)^user-agent:", "")),
    )
    w = (
        Window.partitionBy("site")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attributed = lines.withColumn(
        "agent", F.last(ag, ignorenulls=True).over(w)
    )
    verb = F.when(F.col("line").rlike(r"(?i)^allow:"), "allow").when(
        F.col("line").rlike(r"(?i)^disallow:"), "disallow"
    )
    path = F.trim(F.regexp_replace(F.col("line"), r"(?i)^(dis)?allow:", ""))
    return (
        attributed.withColumn("verb", verb)
        .where(F.col("verb").isNotNull() & (F.col("agent") == agent))
        .where(path != "")  # an empty Disallow: means "allow all" — no rule
        .select("site", "verb", path.alias("path"))
    )


def robots_match(
    urls: DataFrame,
    rules: DataFrame,
    site_col: str = "site",
    path_col: str = "url_path",
) -> DataFrame:
    """URL frontier × robots rules → fetch verdict per URL, RFC 9309
    resolution: the longest matching rule path wins; on a length tie
    Allow wins; no matching rule means allowed.

    The rules side is one small table per site (robots files are KB);
    the join key is the site, then prefix-match + a per-URL window
    picks the winner. The frontier shuffles once on site; at crawl
    scale that is the co-location you want anyway (per-host
    politeness).
    """
    from pyspark.sql import Window

    cand = urls.join(rules, on=site_col, how="left").withColumn(
        "hit",
        F.col("path").isNotNull()
        & F.col(path_col).startswith(F.col("path")),
    )
    # keep every URL: non-matching rule rows rank below any hit, so a
    # URL whose site has rules but none matching still surfaces once
    # (as a non-hit row → allowed). RFC tie-break among hits: longest
    # path first, then 'allow' < 'disallow'.
    w = Window.partitionBy(site_col, path_col).orderBy(
        F.col("hit").desc(),
        F.length(F.coalesce(F.col("path"), F.lit(""))).desc(),
        F.col("verb"),
    )
    top = cand.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return top.select(
        site_col,
        path_col,
        F.when(F.col("hit"), F.col("verb") == "allow")
        .otherwise(F.lit(True))
        .alias("allowed"),
        F.when(F.col("hit"), F.col("path")).otherwise(F.lit("")).alias(
            "matched_rule"
        ),
    )


def parse_sitemap_urls(
    sitemaps: DataFrame,
    site_col: str = "site",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """sitemap.xml → (site, url_path, lastmod) rows (sitemaps.org
    protocol subset: ``<url><loc>…</loc><lastmod>…</lastmod></url>``
    entries extracted with one regexp_extract_all pass — the entry
    grammar is regular, no XML library needed for the protocol subset).

    One narrow pass; a site's sitemap is KB-sized next to the frontier.
    """
    entries = F.regexp_extract_all(
        F.col(xml_col),
        F.lit(r"<url>\s*<loc>([^<]*)</loc>\s*<lastmod>([^<]*)</lastmod>"),
        0,
    )
    ex = sitemaps.select(
        F.col(site_col).alias("site"), F.explode(entries).alias("e")
    )
    return ex.select(
        "site",
        F.regexp_extract("e", r"<loc>([^<]*)</loc>", 1).alias("url_path"),
        F.to_date(
            F.regexp_extract("e", r"<lastmod>([^<]*)</lastmod>", 1)
        ).alias("lastmod"),
    )


def crawl_waves(
    urls: DataFrame,
    per_wave: int = 8,
    site_col: str = "site",
    path_col: str = "url_path",
    order_col: str = "lastmod",
) -> DataFrame:
    """Per-host politeness scheduling: within each site, order URLs
    freshness-first (``order_col`` DESC, path tie-break) and assign
    fetch waves of ``per_wave`` URLs — wave w across all sites fetches
    concurrently, but each host sees at most ``per_wave`` requests per
    wave. One window per site; the frontier shuffles once on the host
    key (the same co-location robots_match uses).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(site_col).orderBy(
        F.col(order_col).desc(), path_col
    )
    return urls.withColumn(
        "wave", ((F.row_number().over(w) - 1) / per_wave).cast("long")
    )
